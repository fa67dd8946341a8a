"""End-to-end smoke of the one-command quality chain (VERDICT r3 item 5):
GenEval sweep -> DPG sweep + in-repo MMU scoring -> FID, on a tiny
random-weights pipeline — proves the plumbing run_real_weights.sh relies
on runs green before real checkpoints land."""

import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from fake_tokenizer import FakeTokenizer  # noqa: E402

from showo_tpu.models.magvit import MagvitV2, VQConfig  # noqa: E402
from showo_tpu.models.phi import PhiConfig  # noqa: E402
from showo_tpu.models.showo import ShowoConfig, init_showo_params  # noqa: E402
from showo_tpu.pipelines.t2i import T2IPipeline  # noqa: E402
from showo_tpu.prompting import UniversalPrompting  # noqa: E402

VQ_TINY = VQConfig(ch=32, enc_ch_mult=(1, 2), enc_num_res_blocks=(1, 1),
                   dec_ch_mult=(1, 2), dec_num_res_blocks=(1, 1), z_channels=4)


def _tiny_pipeline():
    tok = FakeTokenizer()
    uni = UniversalPrompting(tok, max_text_len=8, cond_dropout_prob=0.0)
    text_vocab = 1010
    cfg = ShowoConfig(
        vocab_size=text_vocab + 16 + 1, llm_vocab_size=text_vocab,
        num_new_special_tokens=0, codebook_size=16, num_vq_tokens=16,
        llm=PhiConfig(vocab_size=text_vocab + 17, hidden_size=64,
                      intermediate_size=128, num_layers=2, num_heads=4),
    )
    params = init_showo_params(cfg, jax.random.PRNGKey(0))
    vq = MagvitV2(VQ_TINY)
    vq_params = vq.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 3)))["params"]
    return T2IPipeline(cfg=cfg, params=params, vq_cfg=VQ_TINY,
                       vq_params=vq_params, uni_prompting=uni,
                       guidance_scale=1.5, timesteps=2, max_seq_length=8,
                       resolution=8)


def test_quality_chain_end_to_end(tmp_path):
    from showo_tpu.evaluation.fid import RandomProjectionExtractor
    from showo_tpu.evaluation.run_quality import run_chain

    pipe = _tiny_pipeline()

    # geneval metadata jsonl
    meta = tmp_path / "geneval.jsonl"
    meta.write_text("\n".join(json.dumps({"prompt": p, "tag": "single"})
                              for p in ["a cat", "a dog"]))
    # DPG prompt dir + question csv (schema of dpg_bench.csv)
    pdir = tmp_path / "dpg_prompts"
    pdir.mkdir()
    (pdir / "sample.txt").write_text("a red square")
    csv = tmp_path / "dpg.csv"
    # dpg_bench.csv schema; the FIRST data row is skipped (reference
    # iterrows quirk kept for parity), so row 1 carries the question
    csv.write_text(
        "item_id,proposition_id,dependency,tuple,question_natural_language\n"
        "skipped,1,0,entity - whole (x),is there an x?\n"
        "sample,1,0,entity - whole (square),is there a red square?\n")
    # FID reference dir: two constant images
    rdir = tmp_path / "refs"
    rdir.mkdir()
    from PIL import Image

    Image.new("RGB", (8, 8), (200, 30, 30)).save(rdir / "a.png")
    Image.new("RGB", (8, 8), (30, 200, 30)).save(rdir / "b.png")

    def scorer(image, question):  # stands in for MMUPipelineScorer
        return "yes"

    out = tmp_path / "out"
    summary = run_chain(
        pipe, str(out), ["geneval", "dpg", "fid"],
        geneval_metadata=str(meta),
        dpg_prompts_dir=str(pdir), dpg_csv=str(csv), dpg_scorer=scorer,
        fid_prompts=["a cat", "a dog"], fid_ref_dir=str(rdir),
        fid_extractor=RandomProjectionExtractor(pool=2),
        batch_size=2, dpg_resolution=8)

    assert summary["geneval"]["prompts"] == 2
    assert os.path.exists(os.path.join(
        out, "geneval", "00000", "samples", "00000.png"))
    assert summary["dpg"]["result"]["score"] == 100.0  # scorer says yes
    assert os.path.exists(os.path.join(out, "dpg", "sample.png"))
    assert np.isfinite(summary["fid"]["value"])
    assert summary["fid"]["n_gen"] == 2 and summary["fid"]["n_ref"] == 2
    with open(os.path.join(out, "quality_summary.json")) as f:
        assert json.load(f)["steps"] == ["geneval", "dpg", "fid"]


def test_quality_chain_skips_absent_inputs(tmp_path):
    from showo_tpu.evaluation.run_quality import run_chain

    pipe = _tiny_pipeline()
    summary = run_chain(pipe, str(tmp_path / "o"), ["geneval", "dpg", "fid"])
    assert "skipped" in summary["geneval"]
    assert "skipped" in summary["dpg"]
    assert "skipped" in summary["fid"]


def test_fid_math_properties():
    """FID(x, x) == 0; separated distributions score > 0; matches the
    closed form for Gaussians."""
    from showo_tpu.evaluation.fid import (RandomProjectionExtractor,
                                          activation_statistics,
                                          compute_fid, frechet_distance)

    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (8, 16, 16, 3), dtype=np.uint8)
    b = np.clip(a.astype(np.int32) + 120, 0, 255).astype(np.uint8)
    ex = RandomProjectionExtractor(pool=4)
    assert compute_fid(a, a, ex) < 1e-6
    assert compute_fid(a, b, ex) > 1e-3

    # closed form: identical covariance, shifted mean -> ||dmu||^2
    mu1, s1 = activation_statistics(rng.standard_normal((500, 4)))
    d = frechet_distance(mu1, s1, mu1 + 2.0, s1)
    assert abs(d - 4.0 * 4) < 1e-6
