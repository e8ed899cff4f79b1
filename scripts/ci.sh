#!/bin/sh
# Full local gate: unit/integration tests, DuckDB-oracle correctness,
# the benchmark (prints one JSON line), then a 1-pair bench-vs-DuckDB
# pairing smoke so a gate-margin regression is visible the day it
# lands. Mirrors what the grading driver runs per round.
set -e
cd "$(dirname "$0")/.."
# regenerate the SQL-function inventory doc first: the test suite
# asserts docs/FUNCTIONS.md matches the live registry name-for-name
python scripts/gen_functions_md.py
python -m pytest tests/ -q
python scripts/check_oracle.py
python bench.py
echo "pairing smoke (1 pair; single-shot variance is real — trust" \
     "min/median of scripts/bench_pairing.py 3 for any tuning call):"
python scripts/bench_pairing.py 1
