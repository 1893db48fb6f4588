def chunk_evenly(iterable, n):
    """Split ``iterable`` into chunks of size ~n, spreading the remainder one
    element at a time over the leading chunks.

    Semantics of /root/reference/eeyore/itertools/chunk_evenly.py:1-9 (used for
    Gibbs node sub-blocking): with r = len % n, the first r chunks get n+1
    elements and the rest get n.
    """
    items = list(iterable)
    total = len(items)
    if n <= 0:
        raise ValueError("chunk size must be positive")
    remainder = total % n
    start = 0
    num_chunks = total // n
    for i in range(num_chunks):
        size = n + 1 if i < remainder else n
        yield items[start:start + size]
        start += size
