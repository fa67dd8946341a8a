"""Stage-2 optimizer groups, semantic distillation, VIST dataset tests."""

import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from fake_tokenizer import FakeTokenizer  # noqa: E402

from showo_tpu.show_o2.semantic_layers import (  # noqa: E402
    distillation_loss,
    make_distill_step,
    semantic_layer_features,
)
from showo_tpu.show_o2.showo2 import init_showo2_params  # noqa: E402
from showo_tpu.show_o2.train_stage_two import (  # noqa: E402
    Stage2Config,
    make_stage2_optimizer,
    param_groups,
)
from tests.test_t2i_v2_pipeline import IDS, TINY  # noqa: E402


def test_param_groups():
    params = init_showo2_params(TINY, jax.random.PRNGKey(0))
    labels = param_groups(params)
    assert labels["und_trans"]["layers"]["q"]["kernel"] == "und"
    assert labels["image_embedder_und"]["kernel"] == "und"
    assert labels["fusion_proj"]["fc1"]["kernel"] == "fusion"
    assert labels["showo"]["embed"] == "main"
    assert labels["diffusion_head_a"]["layers"]["q"]["kernel"] == "main"


def test_stage2_optimizer_updates_groups():
    params = init_showo2_params(TINY, jax.random.PRNGKey(0))
    sc = Stage2Config(lr_und=0.0, lr_fusion=1e-3, lr_main=1e-3)
    opt = make_stage2_optimizer(sc, params)
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    # und group has lr 0 -> zero updates (modulo adamw wd on params)
    und_upd = np.asarray(updates["und_trans"]["layers"]["q"]["kernel"])
    main_upd = np.asarray(updates["showo"]["embed"])
    assert np.abs(und_upd).max() < 1e-12
    assert np.abs(main_upd).max() > 1e-6


def test_distillation_step():
    params = init_showo2_params(TINY, jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_distill_step(TINY, opt)
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.normal(size=(2, 16, 8, 8)), jnp.float32)
    target = jnp.asarray(rng.normal(size=(2, 16, TINY.clip_latent_dim)),
                         jnp.float32)
    losses = []
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, latents, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_vist_dataset(tmp_path):
    from PIL import Image

    for i in range(2):
        Image.new("RGB", (20, 20), (i * 100, 50, 50)).save(tmp_path / f"i{i}.png")
    rec = [{"images": ["i0.png", "i1.png"],
            "sentences": ["first scene", "second scene"]}]
    jp = tmp_path / "vist.json"
    jp.write_text(json.dumps(rec))

    from showo_tpu.data.vist_dataset import VISTDataset

    ds = VISTDataset(str(jp), str(tmp_path), FakeTokenizer(), IDS,
                     resolution=16, num_image_tokens=4, max_seq_len=64,
                     max_num_images=3)
    s = ds[0]
    assert s["text_tokens"].shape == (64,)
    assert s["modality_positions"].shape == (3, 2)
    assert tuple(s["modality_positions"][2]) == (0, 0)  # padding tuple
    assert s["images"].shape == (3, 16, 16, 3)
