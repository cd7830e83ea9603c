"""Worker for the 2-process jax.distributed CPU test (not a pytest module).

Run as: python tests/_mp_worker.py <process_id> <num_processes> <port> <outdir>

Exercises the real multi-process code paths (VERDICT r1 missing #5):
``dist_init`` (gloo CPU collectives), ``shard_indices`` disjointness inputs,
``eval._process_mean`` sample-weighted reduction, and ``barrier``.
"""
import json
import os
import sys

pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                            int(sys.argv[3]), sys.argv[4])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = str(nproc)
os.environ["JAX_PROCESS_INDEX"] = str(pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from free_hunch_tpu.parallel import barrier, dist_init, get_rank, get_world_size

dist_init()
dist_init()  # idempotent re-init (the CLI initialises, then Evaluator does)
assert get_rank() == pid, (get_rank(), pid)
assert get_world_size() == nproc, (get_world_size(), nproc)

from free_hunch_tpu.data.dataset import shard_indices
from free_hunch_tpu.eval import _process_mean

my_indices = shard_indices(10, nproc, pid)

# unequal shards: rank 0 contributes 3 samples at metric 1.0, rank 1
# contributes 1 sample at metric 5.0 -> sample-weighted mean 2.0 (the
# reference's rank-average bug would report 3.0)
n_samples = 3 if pid == 0 else 1
means = dict(psnr=1.0 if pid == 0 else 5.0,
             ssim=0.5 if pid == 0 else 0.9,
             lpips=0.2 if pid == 0 else 0.6)
reduced = _process_mean(means, n_samples)

barrier("mp_test")

# cross-process FID moment merge: per-rank disjoint feature batches must
# merge to EXACTLY the single-host accumulation over all of them (the f64
# sums ride the gather as int32 bytes — fid.allgather_merge)
import numpy as np

from free_hunch_tpu.metrics.fid import FeatureStats, allgather_merge

rng = np.random.default_rng(0)  # same stream on both ranks
all_feats = [rng.normal(1e3, 1.0, (3, 16)) for _ in range(nproc)]
mine = FeatureStats(16)
mine.add(all_feats[pid])
merged = allgather_merge(mine)
want = FeatureStats(16)
for f in all_feats:
    want.add(f)
fid_merge_exact = (merged.n == want.n
                   and np.array_equal(merged.s, want.s)
                   and np.array_equal(merged.ss, want.ss))

# training-stats cross-rank sync with RANK-DIVERGENT name sets: report0
# creates 'head' only on rank 0; the union gather must still line the rows
# up (a fixed-order stack would misalign) and the f64 moments must survive
# the gather exactly (they ride as int32 bytes)
from free_hunch_tpu.utils import stats

stats.init_multiprocessing(rank=pid)
stats.report("shared", [float(pid) + 1.0] * 2)   # rank sums: 2 and 4
stats.report0("head", 7.0)                        # exists on rank 0 only
collector = stats.Collector()
collector.update()
stats_sync = dict(shared_num=collector.num("shared"),
                  shared_mean=collector.mean("shared"),
                  head_num=collector.num("head"),
                  head_mean=collector.mean("head"))

# cross-process MODEL parallelism: a spatially partitioned UNet forward whose
# height shards live on DIFFERENT processes, so GSPMD's 3x3-conv halo
# exchanges and GroupNorm/attention reductions run as real gloo collectives
# (the single-process suite only ever exercises them device-to-device).
# Each rank computes the unsharded forward locally and checks the replicated
# sharded output against it.
import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from free_hunch_tpu.models.precond import IDDPMLinearPrecond
from free_hunch_tpu.models.unet import UNetConfig, UNetModel

res = 16
cfg = UNetConfig(image_size=res, in_channels=3, model_channels=32,
                 out_channels=6, num_res_blocks=1, attention_resolutions=(2,),
                 channel_mult=(1, 2), num_heads=2, num_head_channels=16,
                 dtype=jnp.float32, remat=False,
                 spatial_partition=("data", "model"))
model = UNetModel(cfg)
init_model = UNetModel(dataclasses.replace(cfg, spatial_partition=None))
params = init_model.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 3, res, res)), jnp.zeros((1,)))
rng_x = np.random.default_rng(7)  # same stream on both ranks
x = rng_x.standard_normal((2, 3, res, res)).astype(np.float32)
sigma = np.full((2,), 2.5, np.float32)
pre = IDDPMLinearPrecond(model, img_resolution=res, img_channels=3)
ref_pre = IDDPMLinearPrecond(init_model, img_resolution=res, img_channels=3)
want, _ = jax.jit(ref_pre.apply)(params, x, sigma)  # local single device

mesh = Mesh(np.array(jax.devices()).reshape(1, nproc), ("data", "model"))
rep = NamedSharding(mesh, P())
with mesh:
    fn = jax.jit(pre.apply, in_shardings=(rep, rep, rep),
                 out_shardings=rep)
    got, _ = fn(params, x, sigma)
    compiled = fn.lower(params, x, sigma).compile().as_text()
mp_unet_err = float(np.max(np.abs(np.asarray(got) - np.asarray(want))))
mp_unet_communicates = ("collective-permute" in compiled
                        or "all-gather" in compiled
                        or "all-reduce" in compiled
                        or "all-to-all" in compiled)

with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
    json.dump({"rank": get_rank(), "world": get_world_size(),
               "indices": my_indices.tolist(), "reduced": reduced,
               "fid_merge_exact": bool(fid_merge_exact),
               "stats_sync": stats_sync,
               "mp_unet_err": mp_unet_err,
               "mp_unet_communicates": bool(mp_unet_communicates)}, f)
print(f"worker {pid} done", flush=True)
