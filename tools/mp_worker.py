"""Worker for the 2-process ``jax.distributed`` CPU test.

Usage: python tools/mp_worker.py <proc_id> <nproc> <port> <outdir>

Each process forces 4 virtual CPU devices and joins a localhost
rendezvous, forming an 8-device global (dp=2, fsdp=2, tp=2) mesh across
2 processes — the TPU-native replacement for the reference's accelerate
multi-node static rendezvous (accelerate_configs/multi_nodes/
8_gpus_node_0.yaml:5-18).  It then runs:

  1. one v1 fused train step (VQ encode + 3-loss fwd/bwd + AdamW) with
     per-process data shards (the data/loader.py shard_for_process
     contract: each process materializes only its rows),
  2. one Show-o2 stage-1 fused step the same way,
  3. a process-0-only checkpoint write after cross-process replication,

and records {loss_v1, loss_v2, ckpt_written} to <outdir>/proc<i>.json so
the pytest driver can assert cross-process agreement and single-process
equality.
"""

import json
import os
import sys


def main():
    proc_id, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4"
                               + " --xla_backend_optimization_level=0"
                               ).strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=proc_id)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc
    assert len(jax.local_devices()) == 4

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from showo_tpu.parallel.mesh import make_mesh, param_sharding_rules

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    batch_sh = NamedSharding(mesh, P(("dp", "fsdp")))
    B = 8
    lo, hi = proc_id * (B // nproc), (proc_id + 1) * (B // nproc)

    def to_global(local_np):
        return jax.make_array_from_process_local_data(
            batch_sh, np.ascontiguousarray(local_np))

    def sharded_init(init_fn, key):
        abs_p = jax.eval_shape(init_fn, key)
        sh = param_sharding_rules(abs_p, mesh)
        return jax.jit(init_fn, out_shardings=sh)(key)

    results = {}

    # ---- v1 fused step (same tiny dims as __graft_entry__.dryrun) ----
    from showo_tpu.models.magvit import MagvitV2, VQConfig
    from showo_tpu.models.phi import PhiConfig
    from showo_tpu.models.showo import ShowoConfig, init_showo_params
    from showo_tpu.sampling.schedules import cosine_schedule
    from showo_tpu.training.train_showo import make_fused_train_step
    from showo_tpu.training.train_step import (TrainConfig, TrainState,
                                               make_optimizer)

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

    rng = np.random.default_rng(0)     # identical on every process
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

    opt = make_optimizer(tc)
    with jax.set_mesh(mesh):
        params = sharded_init(
            lambda k: init_showo_params(cfg, k), jax.random.PRNGKey(0))
        vq = MagvitV2(vq_cfg)
        vq_params = sharded_init(
            lambda k: vq.init(k, jnp.zeros((1, 8, 8, 3)))["params"],
            jax.random.PRNGKey(1))
        opt_state = jax.jit(opt.init)(params)
        state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))
        step_fn = make_fused_train_step(cfg, vq_cfg, tc, opt, sp, B, B, B,
                                        cosine_schedule)
        batch = {k: to_global(v[lo:hi]) for k, v in full.items()}
        state, metrics = step_fn(
            state, vq_params, batch["t2i_pixels"], batch["t2i_text"],
            batch["lm_ids"], batch["lm_labels"], batch["mmu_pixels"],
            batch["mmu_text"], batch["mmu_labels"], jax.random.PRNGKey(0))
        results["loss_v1"] = float(metrics["loss"])

        # process-0-only checkpoint write: replicate across processes
        # first (sharded leaves are not fully addressable on one host)
        rep_sh = jax.tree.map(lambda _: NamedSharding(mesh, P()),
                              state.params)
        rep = jax.jit(lambda p: p, out_shardings=rep_sh)(state.params)
        if jax.process_index() == 0:
            embed = np.asarray(jax.device_get(rep["showo"]["embed"]))
            np.savez(os.path.join(outdir, "ckpt_proc0.npz"), embed=embed)
            with open(os.path.join(outdir, "metadata.json"), "w") as f:
                json.dump({"global_step": 1}, f)
            results["ckpt_written"] = True
        else:
            results["ckpt_written"] = False

    # ---- v2 stage-1 fused step ----
    from showo_tpu.show_o2.showo2 import init_showo2_params
    from showo_tpu.show_o2.train_stage_one import (Stage1Config,
                                                   make_stage1_optimizer,
                                                   make_stage1_step)
    from showo_tpu.show_o2.transport import Transport
    from showo_tpu.show_o2.wan_vae import init_wan_vae_params
    from tests.test_train_stage_one import TINY, VAE_TINY, N_IMG, _batch

    sc = Stage1Config()
    transport = Transport(snr_type="lognorm", do_shift=True, seq_len=N_IMG)
    v2_full = _batch(B)
    with jax.set_mesh(mesh):
        p2 = sharded_init(lambda k: init_showo2_params(TINY, k),
                          jax.random.PRNGKey(0))
        vae_p = sharded_init(lambda k: init_wan_vae_params(VAE_TINY, k),
                             jax.random.PRNGKey(1))
        optimizer = make_stage1_optimizer(sc, p2, ())
        o2 = jax.jit(optimizer.init)(p2)
        step2 = make_stage1_step(TINY, VAE_TINY, sc, transport, optimizer)
        b2 = {k: to_global(np.asarray(v)[lo:hi]) for k, v in v2_full.items()}
        p2, o2, m2 = step2(p2, o2, vae_p, b2, jax.random.PRNGKey(2))
        results["loss_v2"] = float(m2["loss"])

    with open(os.path.join(outdir, f"proc{proc_id}.json"), "w") as f:
        json.dump(results, f)

    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("mp_worker_done")


if __name__ == "__main__":
    main()
