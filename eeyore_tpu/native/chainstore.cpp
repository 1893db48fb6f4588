// Fast chain-store CSV writer (the native runtime component backing
// eeyore_tpu.chains.ChainFile.update_all).
//
// The reference streams chains through numpy.savetxt one state at a time
// (/root/reference/eeyore/chains/chain_file.py:28-45), re-opening files per
// update; at TPU throughputs (millions of samples/s) the Python formatting
// path becomes the bottleneck of any file-backed run. This C++ writer
// formats %.18e / %d rows with a grown buffer and one write syscall per
// chunk. Exposed through ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// Write `rows` x `cols` doubles as CSV with "%.18e" cells.
// mode: "a" append, "w" truncate. Returns 0 on success.
int write_csv_f64(const char* path, const double* data, int64_t rows,
                  int64_t cols, const char* mode) {
    FILE* f = std::fopen(path, mode);
    if (!f) return 1;

    // ~27 bytes per formatted cell + separator
    std::vector<char> buf;
    buf.reserve(static_cast<size_t>(cols) * 32 + 2);

    char cell[40];
    for (int64_t r = 0; r < rows; ++r) {
        buf.clear();
        const double* row = data + r * cols;
        for (int64_t c = 0; c < cols; ++c) {
            int n = std::snprintf(cell, sizeof(cell), "%.18e", row[c]);
            if (c) buf.push_back(',');
            buf.insert(buf.end(), cell, cell + n);
        }
        buf.push_back('\n');
        if (std::fwrite(buf.data(), 1, buf.size(), f) != buf.size()) {
            std::fclose(f);
            return 2;
        }
    }
    if (std::fclose(f) != 0) return 3;
    return 0;
}

// Write `rows` x `cols` int64s as CSV with "%d" cells (accepted flags).
int write_csv_i64(const char* path, const int64_t* data, int64_t rows,
                  int64_t cols, const char* mode) {
    FILE* f = std::fopen(path, mode);
    if (!f) return 1;

    std::vector<char> buf;
    buf.reserve(static_cast<size_t>(cols) * 24 + 2);

    char cell[24];
    for (int64_t r = 0; r < rows; ++r) {
        buf.clear();
        const int64_t* row = data + r * cols;
        for (int64_t c = 0; c < cols; ++c) {
            int n = std::snprintf(cell, sizeof(cell), "%lld",
                                  static_cast<long long>(row[c]));
            if (c) buf.push_back(',');
            buf.insert(buf.end(), cell, cell + n);
        }
        buf.push_back('\n');
        if (std::fwrite(buf.data(), 1, buf.size(), f) != buf.size()) {
            std::fclose(f);
            return 2;
        }
    }
    if (std::fclose(f) != 0) return 3;
    return 0;
}

// Parse a CSV of doubles back into `out` (rows*cols, caller-sized via
// count_csv first). Returns number of rows parsed, or -1 on error.
int64_t read_csv_f64(const char* path, double* out, int64_t max_rows,
                     int64_t cols) {
    FILE* f = std::fopen(path, "r");
    if (!f) return -1;

    std::string line;
    std::vector<char> linebuf(1 << 16);
    int64_t r = 0;
    while (r < max_rows && std::fgets(linebuf.data(), linebuf.size(), f)) {
        char* p = linebuf.data();
        for (int64_t c = 0; c < cols; ++c) {
            char* end = nullptr;
            out[r * cols + c] = std::strtod(p, &end);
            if (end == p) { std::fclose(f); return -1; }
            p = end;
            if (*p == ',') ++p;
        }
        ++r;
    }
    std::fclose(f);
    return r;
}

}  // extern "C"
