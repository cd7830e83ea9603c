"""Worker for the 2-process Evaluator fault-injection / resume test
(not a pytest module).

Run as: python tests/_mp_eval_worker.py <process_id> <num_processes> <port>
            <outdir> <opts_json>

Joins the gloo-backed jax.distributed runtime, runs the FULL driver
(``free_hunch_tpu.eval.Evaluator``) on a tiny 32px config, and writes this
rank's final metrics to ``<outdir>/worker_result_<rank>.json``. The
``opts_json`` payload may carry ``fault_kill_after_batches`` to make THIS
rank SIGKILL itself mid-run (the eval.py fault-injection hook).
"""
import json
import os
import sys

pid, nproc, port, outdir, opts_json = (int(sys.argv[1]), int(sys.argv[2]),
                                       int(sys.argv[3]), sys.argv[4],
                                       sys.argv[5])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = str(nproc)
os.environ["JAX_PROCESS_INDEX"] = str(pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from free_hunch_tpu.config import load_config  # noqa: E402
from free_hunch_tpu.eval import Evaluator  # noqa: E402

opts = load_config(args=dict(outdir=outdir))
opts.update(json.loads(opts_json))
results = Evaluator(opts).run()

with open(os.path.join(outdir, f"worker_result_{pid}.json"), "w") as f:
    json.dump({k: v for k, v in results.items()
               if isinstance(v, (int, float, str, bool, type(None)))}, f)
print(f"rank {pid} done: {results.get('psnr'):.4f}")
