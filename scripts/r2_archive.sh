#!/bin/sh
# Round-2 final archived benchmark runs (serial — one TPU job at a time).
# Run from the repo root:  sh scripts/r2_archive.sh
set -x
R=benchmarks/results
python benchmarks/sweep_fft.py --trials 4 --max-len 2097152 \
  --csv $R/sweep_r2.csv --table $R/bench-fft-table-r2.md
python benchmarks/sweep_fft.py --non-pow2 --trials 4 \
  --csv $R/sweep_r2_non2.csv
python benchmarks/sweep_fft.py --cplx --quick --trials 2 --max-len 65536 --compare \
  --csv $R/sweep_r2_compare.csv
python benchmarks/bench_pipeline.py --csv $R/pipeline_r2.csv
python benchmarks/bench_engines.py --csv $R/engines_r2.csv
python benchmarks/plots.py $R/sweep_r2.csv $R/sweep_r2_non2.csv -o $R || true
