"""Real multi-process path: 2 ``jax.distributed`` CPU processes.

VERDICT r2 item 3 — everything else in the suite is single-process with
8 virtual devices; this launches tools/mp_worker.py twice over a
localhost rendezvous (4 virtual devices each -> the same 8-device
dp=2/fsdp=2/tp=2 global mesh) and checks:

  * one v1 fused step and one v2 stage-1 fused step run with
    per-process data shards,
  * both processes agree on the global loss,
  * the global loss equals the single-process 8-device run,
  * the checkpoint is written by process 0 only.

Replaces the reference's accelerate static rendezvous surface
(accelerate_configs/multi_nodes/8_gpus_node_0.yaml:5-18).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def mp_results(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("mp"))
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "PYTHONPATH", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", str(port), outdir],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            # generous: two fresh processes each compile the fused steps;
            # under a loaded machine (parallel pytest) 600 s has tripped
            out, err = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\n{out}\n{err}"
    res = []
    for i in range(2):
        with open(os.path.join(outdir, f"proc{i}.json")) as f:
            res.append(json.load(f))
    return outdir, res


def test_processes_agree(mp_results):
    _, (r0, r1) = mp_results
    assert np.isfinite(r0["loss_v1"]) and np.isfinite(r0["loss_v2"])
    np.testing.assert_allclose(r0["loss_v1"], r1["loss_v1"], rtol=1e-6)
    np.testing.assert_allclose(r0["loss_v2"], r1["loss_v2"], rtol=1e-6)


def test_checkpoint_process0_only(mp_results):
    outdir, (r0, r1) = mp_results
    assert r0["ckpt_written"] and not r1["ckpt_written"]
    assert os.path.exists(os.path.join(outdir, "ckpt_proc0.npz"))
    with open(os.path.join(outdir, "metadata.json")) as f:
        assert json.load(f)["global_step"] == 1


def test_matches_single_process(mp_results):
    """The 2-process global loss equals the single-process 8-device run
    of the SAME global batch (the v1 fused step, as in dryrun)."""
    import jax
    import jax.numpy as jnp

    from showo_tpu.models.magvit import MagvitV2, VQConfig
    from showo_tpu.models.phi import PhiConfig
    from showo_tpu.models.showo import ShowoConfig, init_showo_params
    from showo_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from showo_tpu.sampling.schedules import cosine_schedule
    from showo_tpu.training.train_showo import make_fused_train_step
    from showo_tpu.training.train_step import (TrainConfig, TrainState,
                                               make_optimizer)

    _, (r0, _) = mp_results
    text_vocab = 1010
    cfg = ShowoConfig(
        vocab_size=text_vocab + 17, llm_vocab_size=text_vocab,
        num_new_special_tokens=0, codebook_size=16, num_vq_tokens=16,
        llm=PhiConfig(vocab_size=text_vocab + 17, hidden_size=64,
                      intermediate_size=128, num_layers=2, num_heads=4),
    )
    vq_cfg = VQConfig(ch=32, enc_ch_mult=(1, 2), enc_num_res_blocks=(1, 1),
                      dec_ch_mult=(1, 2), dec_num_res_blocks=(1, 1),
                      z_channels=4)
    tc = TrainConfig(max_seq_length=8)
    sp = {"<|pad|>": 1002, "<|soi|>": 1003, "<|eoi|>": 1004, "<|mmu|>": 1005}

    B = 8
    rng = np.random.default_rng(0)    # same seed as tools/mp_worker.py
    full = {
        "t2i_pixels": rng.normal(size=(B, 8, 8, 3)).astype(np.float32),
        "t2i_text": rng.integers(2, 900, size=(B, 9)),
        "lm_ids": rng.integers(2, 900, size=(B, 9 + cfg.num_vq_tokens + 2)),
        "mmu_pixels": rng.normal(size=(B, 8, 8, 3)).astype(np.float32),
        "mmu_text": rng.integers(2, 900, size=(B, 8)),
    }
    full["lm_labels"] = np.where(full["lm_ids"] > 100, full["lm_ids"], -100)
    full["mmu_labels"] = np.where(full["mmu_text"] > 100,
                                  full["mmu_text"], -100)

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    opt = make_optimizer(tc)
    with jax.set_mesh(mesh):
        params = shard_params(init_showo_params(cfg, jax.random.PRNGKey(0)),
                              mesh)
        vq = MagvitV2(vq_cfg)
        vq_params = shard_params(
            vq.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 3)))["params"],
            mesh)
        state = TrainState(params, jax.jit(opt.init)(params),
                           jnp.zeros((), jnp.int32))
        step_fn = make_fused_train_step(cfg, vq_cfg, tc, opt, sp, B, B, B,
                                        cosine_schedule)
        batch = shard_batch({k: jnp.asarray(v) for k, v in full.items()},
                            mesh)
        _, metrics = step_fn(
            state, vq_params, batch["t2i_pixels"], batch["t2i_text"],
            batch["lm_ids"], batch["lm_labels"], batch["mmu_pixels"],
            batch["mmu_text"], batch["mmu_labels"], jax.random.PRNGKey(0))
        loss = float(metrics["loss"])

    np.testing.assert_allclose(r0["loss_v1"], loss, rtol=1e-5)
