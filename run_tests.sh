#!/bin/bash
# Run the test suite on CPU (float64, 8 virtual devices) — the parity gate.
set -e
cd "$(dirname "$0")"
python -m pytest tests/ -q "$@"
