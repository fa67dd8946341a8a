"""Trainer periodic-generation validation hook test."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from fake_tokenizer import FakeTokenizer  # noqa: E402

from showo_tpu.models.magvit import MagvitV2  # noqa: E402
from showo_tpu.models.showo import init_showo_params  # noqa: E402
from showo_tpu.prompting import UniversalPrompting  # noqa: E402
from showo_tpu.training.train_showo import ShowoTrainer  # noqa: E402
from tests.test_train_showo import VQ_TINY, _cfgs  # noqa: E402


def test_generate_validation_images(tmp_path):
    cfg, config = _cfgs()
    config["dataset"]["params"] = {"resolution": 8}
    uni = UniversalPrompting(FakeTokenizer(), max_text_len=8,
                             cond_dropout_prob=0.0)
    params = init_showo_params(cfg, jax.random.PRNGKey(0))
    vq = MagvitV2(VQ_TINY)
    vq_params = vq.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 3)))["params"]
    trainer = ShowoTrainer(config=config, cfg=cfg, vq_cfg=VQ_TINY,
                           params=params, vq_params=vq_params,
                           uni_prompting=uni)
    trainer.config.training["guidance_scale"] = 1.5
    trainer.config.training["generation_timesteps"] = 2
    images = trainer.generate_validation_images(
        ["a cat", "a dog"], jax.random.PRNGKey(0), str(tmp_path))
    assert images.shape[0] == 2
    samples = os.listdir(tmp_path / "samples")
    assert len(samples) == 2
