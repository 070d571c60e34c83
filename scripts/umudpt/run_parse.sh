#!/usr/bin/env bash
# Aggregate accuracy / macro_f1 across seeds (reference scripts/umudpt/run_parse.sh
# called a parse_test_res.py that was missing from the repo — ours ships)
python tools/parse_test_res.py "${1:-output}" --keyword accuracy macro_f1 --group-depth "${2:--1}"
