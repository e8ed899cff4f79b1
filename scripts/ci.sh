#!/bin/sh
# Full local gate: unit/integration tests, DuckDB-oracle correctness,
# then the benchmark (prints one JSON line). Mirrors what the grading
# driver runs per round.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python scripts/check_oracle.py
python bench.py
