"""WebDataset tar-shard reader: key grouping, sharding, shuffle,
warn-and-continue (reference: flowae/datasets/webdataset.py)."""
import io
import tarfile

import numpy as np
import pytest

from minimax_speech_tpu.data.webdataset import (WebDatasetShards,
                                                write_shards)


def _png_bytes(rgb: np.ndarray) -> bytes:
    from PIL import Image

    b = io.BytesIO()
    Image.fromarray(rgb.astype(np.uint8)).save(b, format="PNG")
    return b.getvalue()


def make_shards(tmp_path, n=12, per_shard=4, wide=False):
    def gen():
        for i in range(n):
            h, w = (20, 34) if wide else (24, 24)
            rgb = np.full((h, w, 3), i * 20 % 255, np.uint8)
            yield f"{i:06d}", {"png": _png_bytes(rgb),
                               "txt": f"caption {i}".encode()}

    return write_shards(gen(), tmp_path / "shards",
                        samples_per_shard=per_shard)


def test_key_grouped_samples_and_batches(tmp_path):
    paths = make_shards(tmp_path, n=12, per_shard=4, wide=True)
    assert len(paths) == 3
    ds = WebDatasetShards(tmp_path / "shards", size=16, shuffle_buffer=1)
    got = list(ds.samples(epoch=0))
    assert len(got) == 12
    for s in got:
        # caption stays paired with ITS image: pixel value i*20 <-> text i
        i = int(s["caption"].split()[-1])
        px = (s["image"][0, 0] + 1) * 127.5
        assert abs(px[0] - (i * 20 % 255)) < 2.0, (s["caption"], px)
        assert s["image"].shape == (16, 16, 3)  # square-crop + resize
        assert s["key"] == f"{i:06d}"

    (b,) = list(ds.batches(12, epoch=0))
    assert b["image"].shape == (12, 16, 16, 3)
    assert len(b["caption"]) == 12


def test_rank_sharding_partitions_shards(tmp_path):
    make_shards(tmp_path, n=12, per_shard=4)
    keys = []
    for rank in range(2):
        ds = WebDatasetShards(tmp_path / "shards", size=8, seed=7,
                              rank=rank, world=2)
        keys.append({s["key"] for s in ds.samples(epoch=0)})
    # 3 shards over 2 ranks: disjoint, 8+4 split, union = everything
    assert keys[0] & keys[1] == set()
    assert sorted(len(k) for k in keys) == [4, 8]
    assert keys[0] | keys[1] == {f"{i:06d}" for i in range(12)}


def test_epoch_shuffle_is_seeded(tmp_path):
    make_shards(tmp_path, n=12, per_shard=4)
    ds = WebDatasetShards(tmp_path / "shards", size=8, shuffle_buffer=6,
                          seed=3)
    e0 = [s["key"] for s in ds.samples(epoch=0)]
    e0b = [s["key"] for s in ds.samples(epoch=0)]
    e1 = [s["key"] for s in ds.samples(epoch=1)]
    assert e0 == e0b          # deterministic
    assert e0 != e1           # epoch reshuffles
    assert sorted(e0) == sorted(e1)


def test_corrupt_member_warn_and_continue(tmp_path, capsys):
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    with tarfile.open(shard_dir / "s.tar", "w") as tf:
        good = _png_bytes(np.zeros((8, 8, 3), np.uint8))
        for key, data in (("a", b"not a png"), ("b", good)):
            info = tarfile.TarInfo(f"{key}.png")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    ds = WebDatasetShards(shard_dir, size=8, shuffle_buffer=1)
    got = [s["key"] for s in ds.samples()]
    assert got == ["b"]
    assert "skip" in capsys.readouterr().out


def test_image_trainer_accepts_tar_shards(tmp_path):
    from argparse import Namespace

    from minimax_speech_tpu.cli.train_flowae_image import build_dataset

    make_shards(tmp_path, n=8, per_shard=4)
    args = Namespace(tar_shards=str(tmp_path / "shards"), image_dir=None,
                     image_size=16, max_images=6, seed=0,
                     synthetic=False, class_cond=False, n_classes=0)
    data, labels, n_classes = build_dataset(args)
    assert data.shape == (6, 16, 16, 3)
    assert data.min() >= -1.0 and data.max() <= 1.0
    assert labels is None and n_classes == 0


def test_json_list_and_validation(tmp_path):
    paths = make_shards(tmp_path, n=4, per_shard=4)
    lst = tmp_path / "tars.json"
    lst.write_text(__import__("json").dumps([str(p) for p in paths]))
    ds = WebDatasetShards(lst, size=8)
    assert len(list(ds.samples())) == 4
    with pytest.raises(FileNotFoundError):
        WebDatasetShards([])
    with pytest.raises(ValueError):
        WebDatasetShards(paths, rank=2, world=2)
