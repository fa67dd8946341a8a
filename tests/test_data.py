"""Data-pipeline tests over synthetic fixtures (tar / parquet / jsonl /
folder / conversations)."""

import io
import json
import os
import sys
import tarfile

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from fake_tokenizer import FakeTokenizer  # noqa: E402

from showo_tpu.data.loader import DataLoader, ShuffleBuffer  # noqa: E402
from showo_tpu.data.mixed import MixedDataLoader  # noqa: E402
from showo_tpu.data.tar_shards import (  # noqa: E402
    Text2ImageTarDataset,
    brace_expand,
    remove_prefix,
)


def _png_bytes(color):
    from PIL import Image

    img = Image.new("RGB", (20, 16), color)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture()
def tar_shard(tmp_path):
    path = tmp_path / "shard-{00000..00001}.tar"
    for s in range(2):
        p = tmp_path / f"shard-{s:05d}.tar"
        with tarfile.open(p, "w") as tf:
            for i in range(3):
                key = f"{s}_{i:04d}"
                img = _png_bytes((i * 50, 100, 150))
                for ext, data in (("jpg", img),
                                  ("txt", f"The image features caption {key}".encode())):
                    info = tarfile.TarInfo(f"{key}.{ext}")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
    return str(path)


def test_brace_expand():
    assert brace_expand("s-{000..002}.tar") == ["s-000.tar", "s-001.tar",
                                                "s-002.tar"]


def test_tar_dataset(tar_shard):
    ds = Text2ImageTarDataset(tar_shard, resolution=16, shuffle_buffer=0,
                              resample=False, shard_for_host=False)
    samples = list(ds)
    assert len(samples) == 6
    assert samples[0]["image"].shape == (16, 16, 3)
    assert samples[0]["text"].startswith("caption")  # prefix removed


def test_loader_batches(tar_shard):
    ds = Text2ImageTarDataset(tar_shard, resolution=16, shuffle_buffer=0,
                              resample=False, shard_for_host=False)
    dl = DataLoader(lambda: iter(ds), batch_size=4, num_epochs=1)
    batches = list(dl)
    assert len(batches) == 1  # 6 samples, drop_last
    assert batches[0]["image"].shape == (4, 16, 16, 3)


def test_refinedweb(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [f"document number {i} " * 50 for i in range(10)]
    pq.write_table(pa.table({"content": rows}), tmp_path / "d.parquet")

    from showo_tpu.data.refinedweb import RefinedWebDataset

    ds = RefinedWebDataset(str(tmp_path / "d.parquet"), rank=0, world_size=2,
                           max_length=100)
    got = list(ds)
    assert len(got) == 5
    assert all(len(s["input_ids"]) <= 100 for s in got)


def test_llava_preprocess():
    from showo_tpu.data.llava import preprocess_conversation

    tok = FakeTokenizer()
    source = [
        {"from": "human", "value": "<image>\nWhat is this?"},
        {"from": "gpt", "value": "A cat."},
        {"from": "human", "value": "What color?"},
        {"from": "gpt", "value": "Black."},
    ]
    ids, labels, sys_ids = preprocess_conversation(source, tok)
    assert ids.shape == labels.shape
    # some instruction positions ignored, some answer positions kept
    assert (labels == -100).any()


def test_mixed_loader_concat():
    a = [{"x": np.ones((2, 3))} for _ in range(4)]
    b = [{"x": np.zeros((1, 3))} for _ in range(2)]
    ml = MixedDataLoader([a, b], mode="concat_max_size_cycle")
    batches = list(ml)
    assert all(bt["x"].shape == (3, 3) for bt in batches)
    assert len(batches) == 4  # b wraps until a (longest) is exhausted


def test_image_text_dataset(tmp_path):
    from PIL import Image

    img_path = tmp_path / "img0.png"
    Image.new("RGB", (32, 32), (10, 20, 30)).save(img_path)
    jsonl = tmp_path / "data.jsonl"
    with open(jsonl, "w") as f:
        for i in range(3):
            f.write(json.dumps({"path": "img0.png",
                                "prompt": f"prompt {i}"}) + "\n")

    from showo_tpu.data.image_text import ImageTextDataset

    ids = dict(bos_id=1, eos_id=2, boi_id=3, eoi_id=4, pad_id=5, img_pad_id=6)
    ds = ImageTextDataset(str(jsonl), FakeTokenizer(), ids,
                          image_root=str(tmp_path), resolution=16,
                          num_image_tokens=8, max_seq_len=32,
                          cond_dropout_prob=0.0)
    s = ds[0]
    assert s["text_tokens"].shape == (32,)
    assert s["modality_positions"].shape == (1, 2)
    assert s["images"].shape == (16, 16, 3)
    assert s["image_masks"].sum() == 8


def test_external_caption_join(tmp_path):
    """Reference data.py:241-331 table joins + 50/50 short/long sampling."""
    import json as _json

    from showo_tpu.data.tar_shards import ExternalCaptionJoin

    # SA1B: captions keyed by sample key basename
    sa1b = tmp_path / "sa1b_caps"
    sa1b.mkdir()
    (sa1b / "sa_001.txt").write_text(
        "The image features a red fox. It sits on grass.\n")
    # laion: captions under <shard-stem>/<key>.caption
    laion = tmp_path / "laion_caps" / "00005"
    laion.mkdir(parents=True)
    (laion / "k1.caption").write_text("A blue bird on a branch. Close up.\n")
    # journeydb json map
    jdb = tmp_path / "jdb.json"
    jdb.write_text(_json.dumps({"jdb_key": ["prompt one", "prompt two"]}))

    join = ExternalCaptionJoin(
        sa1b_caption_dir=str(tmp_path / "sa1b_caps"),
        laion_caption_dir=str(tmp_path / "laion_caps"),
        journeydb_caption_json=str(jdb), seed=0)

    # generation mode: 50/50 short/long, prefixes removed
    outs = {join({"txt": b""}, "x/SA1B/s.tar", "SA1B/sa_001")
            for _ in range(30)}
    assert outs == {"a red fox",  # short: first sentence, prefix removed
                    "a red fox. It sits on grass."}

    outs_l = {join({}, "/data/laion5b/00005.tar", "k1") for _ in range(30)}
    assert outs_l == {"A blue bird on a branch",
                      "A blue bird on a branch. Close up."}

    assert join({}, "any", "jdb_key") in ("prompt one", "prompt two")
    # missing caption file -> empty caption, not a crash
    assert join({"txt": b"fallback"}, "x/SA1B/s.tar", "SA1B/missing") in ("", "fallback")

    # captioning mode: prompt prepended, NO prefix removal
    cap = ExternalCaptionJoin(sa1b_caption_dir=str(tmp_path / "sa1b_caps"),
                              is_captioning=True, add_caption_prompt=True,
                              seed=1)
    out = cap({}, "x/SA1B/s.tar", "SA1B/sa_001")
    assert out.endswith("The image features a red fox. It sits on grass.")
    assert len(out) > len("The image features a red fox. It sits on grass.")


def test_wandb_run_id_resume(tmp_path):
    """train.py:129-151: the run id persists across invocations of the same
    output_dir so a resumed run reattaches."""
    from showo_tpu.config import Config
    from showo_tpu.utils.logging import resolve_wandb_run_id

    cfg = Config({"wandb": Config(resume="auto")})
    rid1, resume1 = resolve_wandb_run_id(cfg, str(tmp_path))
    assert len(rid1) == 8 and resume1 is False
    rid2, resume2 = resolve_wandb_run_id(cfg, str(tmp_path))
    assert rid2 == rid1 and resume2 == "auto"
    # explicit config id wins
    cfg2 = Config({"wandb": Config(resume="must", run_id="abcd1234")})
    rid3, resume3 = resolve_wandb_run_id(cfg2, str(tmp_path))
    assert rid3 == "abcd1234" and resume3 == "must"
