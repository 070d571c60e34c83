import sys
import mudpt_tpu.models.transformer as T
specs = sys.argv[1:]
import importlib
sweep = open('_sweep3.py').read()
exec_globals = {}
exec(compile(sweep.replace('import sys\nfor spec in sys.argv[1:]:\n    B, impl = spec.split(":")\n    run(int(B), impl)', ''), '_sweep3_inline', 'exec'), exec_globals)
run = exec_globals['run']
for spec in specs:
    B, impl, mode = spec.split(":")
    T.set_remat_mode(mode)
    print(f"--- remat={mode}", flush=True)
    run(int(B), impl)
