"""2-process ``jax.distributed`` CPU test (VERDICT r1 missing #5): spawns two
real worker processes that join one gloo-backed runtime and exercise
``dist_init``, ``shard_indices`` disjointness, the sample-weighted
``_process_mean`` allgather reduction, and ``barrier`` — no TPU required.

Parity: reference ``torch_utils/distributed.py:19-45`` (gloo CPU fallback)
and ``generate_conditional.py:557-569`` (cross-rank metric reduction), which
upstream never tests without a cluster (SURVEY.md §4)."""
import json
import os
import socket
import subprocess
import sys

import pytest

# heavyweight tier: torch oracles / e2e CLI / multi-process / full-model
# forwards — excluded from the <5 min fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_mp_worker.py")
_EVAL_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "_mp_eval_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_cpu(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS",)}  # workers use 1 real CPU device each
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(pid), "2", str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = [json.load(open(tmp_path / f"result_{pid}.json"))
               for pid in range(2)]
    assert [r["world"] for r in results] == [2, 2]
    assert [r["rank"] for r in results] == [0, 1]

    # shard_indices: disjoint, jointly covering [0, 10)
    i0, i1 = (set(results[0]["indices"]), set(results[1]["indices"]))
    assert i0.isdisjoint(i1)
    assert i0 | i1 == set(range(10))

    # sample-weighted cross-process mean: (3*1.0 + 1*5.0)/4 = 2.0 on both
    # ranks (the reference's per-rank averaging bug would report 3.0)
    for r in results:
        assert r["reduced"]["psnr"] == pytest.approx(2.0)
        assert r["reduced"]["ssim"] == pytest.approx((3 * 0.5 + 0.9) / 4)
        assert r["reduced"]["lpips"] == pytest.approx((3 * 0.2 + 0.6) / 4)

    # FID moment merge: both ranks must reconstruct the single-host sums
    # BIT-exactly through the int32-byte allgather (fid.allgather_merge)
    assert [r["fid_merge_exact"] for r in results] == [True, True]

    # cross-process model parallelism: the spatially partitioned UNet ran
    # with its height shards on different PROCESSES (halo exchanges and
    # norm/attention reductions as real gloo collectives) and matched each
    # rank's locally computed unsharded forward
    for r in results:
        assert r["mp_unet_communicates"], "sharded UNet compiled collective-free"
        assert r["mp_unet_err"] < 2e-5, r["mp_unet_err"]

    # training-stats sync with RANK-DIVERGENT counter names: 'shared' is
    # reported on both ranks (rank sums 2 and 4 over 2 samples each) and
    # 'head' only on rank 0 via report0 — both ranks must see the union
    # with identical, exactly-summed moments, and a follow-up no-new-data
    # update() must keep (not zero) the previous window
    for r in results:
        ss = r["stats_sync"]
        assert ss["shared_num"] == 4
        assert ss["shared_mean"] == pytest.approx(1.5)
        assert ss["head_num"] == 1
        assert ss["head_mean"] == pytest.approx(7.0)


# --------------------------------------------------------------------------
# fault injection: kill -9 one rank mid-run, restart with --resume
# (VERDICT r3 item 7; reference anchor: torch_utils/distributed.py:59-70 —
# upstream has NO recovery, a crash loses the run)
# --------------------------------------------------------------------------

_SETUP32 = ("--channel_mult 1,2 "
            "--attention_resolutions 8 --class_cond False "
            "--diffusion_steps 1000 --dropout 0.0 --image_size 32 "
            "--learn_sigma True --noise_schedule linear --num_channels 32 "
            "--num_head_channels 16 --num_res_blocks 1 "
            "--resblock_updown True --use_fp16 False "
            "--use_scale_shift_norm True --use_new_attention_order False")


def _eval_opts(models_dir, setup_path, outdir, **over):
    opts = dict(
        outdir=outdir,
        openai_state_dict_path=os.path.join(models_dir, "missing.pt"),
        openai_setup_path=setup_path, allow_random_init=True,
        dataset_path="/root/reference/data/imagenet/00000",
        total_images=8, batch_size=2, num_steps=2,
        conditioning_mechanism="dps", operator_name="inpainting",
        noise_sigma=0.05, seeds=[0], dtype="float32",
        cg_maxiter=20, save_images=True)
    opts.update(over)
    return opts


def _spawn_eval(pid, port, outdir, opts):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    # arm the fault-injection hook: eval.py honours fault_kill_after_batches
    # only under this env var (a stray programmatic opt alone must not be
    # able to SIGKILL a production run)
    env["FREE_HUNCH_FAULT_INJECT"] = "1"
    return subprocess.Popen(
        [sys.executable, _EVAL_WORKER, str(pid), "2", str(port), outdir,
         json.dumps(opts)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def _read_journals(outdir):
    out = {}
    for rank in range(2):
        path = os.path.join(outdir, f"metrics_rank{rank:02d}.jsonl")
        with open(path) as f:
            out[rank] = [json.loads(line) for line in f if line.strip()]
    return out


def test_two_process_kill9_resume(tmp_path):
    """A 2-process driver run loses rank 1 to SIGKILL mid-run; restarting
    both ranks with --resume replays the journaled batches and recomputes
    the rest, reproducing the uninterrupted run's per-batch journal records
    EXACTLY and its final reduced metrics."""
    models = tmp_path / "models"
    models.mkdir()
    setup = models / "setup32.txt"
    setup.write_text(_SETUP32)

    # --- ground truth: uninterrupted 2-process run -------------------------
    out_a = str(tmp_path / "outA")
    port = _free_port()
    procs = [_spawn_eval(p, port, out_a,
                         _eval_opts(str(models), str(setup), out_a))
             for p in range(2)]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"ground-truth worker failed:\n{out[-3000:]}"
    journals_a = _read_journals(out_a)
    assert [len(journals_a[r]) for r in (0, 1)] == [2, 2]
    result_a = json.load(open(os.path.join(out_a, "worker_result_0.json")))

    # --- fault run: rank 1 SIGKILLs itself after 1 computed batch ----------
    out_b = str(tmp_path / "outB")
    port = _free_port()
    p0 = _spawn_eval(0, port, out_b, _eval_opts(str(models), str(setup), out_b))
    p1 = _spawn_eval(1, port, out_b,
                     _eval_opts(str(models), str(setup), out_b,
                                fault_kill_after_batches=1))
    p1_out, _ = p1.communicate(timeout=540)
    assert p1.returncode == -9, \
        f"rank 1 should die by SIGKILL, got {p1.returncode}:\n{p1_out[-2000:]}"
    # rank 0 is now partnered with a corpse: it either errors out of the
    # final cross-process reduction or blocks — bound it and reap by PID
    try:
        p0.communicate(timeout=120)
    except subprocess.TimeoutExpired:
        p0.kill()
        p0.communicate()
    journals_mid = _read_journals(out_b)
    assert len(journals_mid[1]) == 1, "rank 1 should journal exactly 1 batch"
    # the surviving record must already equal the uninterrupted run's
    assert journals_mid[1][0] == journals_a[1][0]

    # --- recovery: restart BOTH ranks with --resume in the same outdir -----
    port = _free_port()
    procs = [_spawn_eval(p, port, out_b,
                         _eval_opts(str(models), str(setup), out_b,
                                    resume=True))
             for p in range(2)]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"resume worker failed:\n{out[-3000:]}"

    # journal replay reproduces the uninterrupted journals byte-for-byte
    # (same batch ids, same float metrics, same order)
    journals_b = _read_journals(out_b)
    assert journals_b == journals_a

    # final reduced metrics equal the uninterrupted run's exactly (replayed
    # records carry the identical floats through the same reduction order)
    result_b = json.load(open(os.path.join(out_b, "worker_result_0.json")))
    for key in ("psnr", "ssim", "lpips", "images"):
        assert result_b[key] == result_a[key], (key, result_a, result_b)
    # rank 0 replayed its 2 journaled batches; rank 1 replayed its 1
    assert result_b["resumed_batches"] == 3
