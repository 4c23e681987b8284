"""Run a single bench.py function standalone (chip-queue hygiene while
iterating: the full harness takes ~an hour of compiles).

Run:  python scripts/run_one_bench.py bench_protein_remd_production
"""

import importlib.util
import json
import os
import sys

# file scripts put scripts/ (not the repo root) on sys.path; pmarlo_tpu
# and bench.py live at the root. Do NOT fix this via PYTHONPATH: the
# axon TPU plugin rides the inherited PYTHONPATH and overriding it kills
# the backend.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.chdir(_ROOT)

spec = importlib.util.spec_from_file_location("bench", "bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

name = sys.argv[1]
out = getattr(bench, name)()
print(json.dumps(
    {k: (round(v, 4) if isinstance(v, float) else v) for k, v in out.items()},
    indent=1, default=str))
