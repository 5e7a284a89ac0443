"""Dataset layer tests (lifecycle, indexing semantics, subset views).

Download-based datasets can't be exercised offline; the procedural
SwisscheeseDataset covers the full FlooderDataset lifecycle, and indexing
semantics are covered on it directly (reference tests had no dataset tests
at all — this is additional coverage)."""

import numpy as np
import pytest

from flooder_tpu.datasets import (
    CoralDataset,
    FlooderData,
    MCBDataset,
    ModelNet10Dataset,
    SwisscheeseDataset,
)


@pytest.fixture(scope="module")
def cheese_ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("swisscheese")
    return SwisscheeseDataset(
        str(root), ks=[2, 4], num_per_class=4, num_points=500
    )


def test_lifecycle_and_load(cheese_ds):
    ds = cheese_ds
    assert len(ds) == 8
    assert ds.num_classes == 2
    assert ds.classes == [0, 1]
    assert set(ds.splits.keys()) == set(range(10))
    item = ds[0]
    assert isinstance(item, FlooderData)
    assert item.x.shape == (500, 3)
    assert item.x.dtype == np.float32
    # splits partition the dataset 72/8/20
    s = ds.splits[0]
    all_idx = sorted(s["trn"] + s["val"] + s["tst"])
    assert all_idx == list(range(8))


def test_reload_from_processed(cheese_ds):
    # second construction must reuse processed artifacts (sentinel logic)
    ds2 = SwisscheeseDataset(
        cheese_ds.root, ks=[2, 4], num_per_class=4, num_points=500
    )
    assert len(ds2) == 8
    assert [d.name for d in ds2] == [d.name for d in cheese_ds]


def test_indexing_views(cheese_ds):
    ds = cheese_ds
    sub = ds[2:6]
    assert len(sub) == 4
    assert sub[0].name == ds[2].name
    # float-fraction slicing
    frac = ds[:0.5]
    assert len(frac) == 4
    # integer-array and bool-array indexing
    ia = ds[np.asarray([0, 3, 5], dtype=np.int64)]
    assert len(ia) == 3 and ia[1].name == ds[3].name
    mask = np.zeros(8, dtype=bool)
    mask[[1, 7]] = True
    bm = ds[mask]
    assert len(bm) == 2 and bm[1].name == ds[7].name
    # nested views compose
    nested = ds[2:8][::2]
    assert len(nested) == 3 and nested[1].name == ds[4].name
    # sequences
    seq = ds[[7, 0]]
    assert seq[0].name == ds[7].name
    with pytest.raises(IndexError):
        ds["bad"]


def test_torch_tensor_indexing(cheese_ds):
    torch = pytest.importorskip("torch")
    ds = cheese_ds
    sub = ds[torch.tensor([1, 2], dtype=torch.long)]
    assert len(sub) == 2
    mask = torch.zeros(8, dtype=torch.bool)
    mask[5] = True
    assert len(ds[mask]) == 1


def test_shuffle(cheese_ds):
    np.random.seed(0)
    shuffled, perm = cheese_ds.shuffle(return_perm=True)
    assert sorted(perm.tolist()) == list(range(8))
    assert shuffled[0].name == cheese_ds[int(perm[0])].name


def test_transforms(cheese_ds):
    def double(d):
        return FlooderData(x=d.x * 2, y=d.y, name=d.name)

    ds = SwisscheeseDataset(
        cheese_ds.root, ks=[2, 4], num_per_class=4, num_points=500,
        transform=double,
    )
    assert np.allclose(ds[0].x, cheese_ds[0].x * 2)


def test_repr(cheese_ds):
    r = repr(cheese_ds)
    assert "SwisscheeseDataset" in r and "n=8" in r
    assert "subset=yes" in repr(cheese_ds[:4])


def test_download_requires_gdown_or_manual(tmp_path):
    # zero-egress environment: downloads must fail with a clear message
    try:
        import gdown  # noqa: F401

        pytest.skip("gdown installed; download path untestable offline")
    except ImportError:
        pass
    for cls in (CoralDataset, MCBDataset, ModelNet10Dataset):
        with pytest.raises(ImportError, match="gdown"):
            cls(str(tmp_path / cls.__name__))


def test_pinned_checksums():
    # dataset identity must match the reference distribution exactly
    assert CoralDataset.checksum.fget(None).startswith("e8b5ae6b")
    assert MCBDataset.checksum.fget(None).startswith("dc36e1c5")
    assert ModelNet10Dataset.checksum.fget(None).startswith("6f9504d5")


def test_archive_pipeline_offline(tmp_path):
    """End-to-end FlooderDataset archive path without network: pre-place
    a synthetic .tar.zst (the manual-download path the ImportError
    message documents), then check extraction (zstd stream + tar
    data_filter guard), per-.npy processing, the _done sentinel,
    split persistence, loading, and artifact-resume on reinstantiation
    (reference datasets.py:562-677 semantics)."""
    zstd = pytest.importorskip("zstandard")
    import io
    import tarfile

    import yaml

    from flooder_tpu.datasets import ModelNet10Dataset

    # build the archive in memory: folder_name/{meta,splits}.yaml + .npy
    rng = np.random.default_rng(0)
    files = {
        "chair_0001.npy": rng.integers(
            -32767, 32767, size=(50, 3), dtype=np.int64
        ),
        "desk_0002.npy": rng.integers(
            -32767, 32767, size=(40, 3), dtype=np.int64
        ),
    }
    meta = {
        "data": {
            "chair_0001.npy": {"label": 0},
            "desk_0002.npy": {"label": 1},
        }
    }
    splits = {"splits": {"0": {"trn": [0], "tst": [1]}}}
    tar_buf = io.BytesIO()
    with tarfile.open(fileobj=tar_buf, mode="w") as tar:
        def add(name, payload: bytes):
            info = tarfile.TarInfo(f"modelnet10_250k/{name}")
            info.size = len(payload)
            tar.addfile(info, io.BytesIO(payload))

        add("meta.yaml", yaml.safe_dump(meta).encode())
        add("splits.yaml", yaml.safe_dump(splits).encode())
        for name, arr in files.items():
            b = io.BytesIO()
            np.save(b, arr)
            add(name, b.getvalue())
    root = tmp_path / "mn10"
    (root / "raw").mkdir(parents=True)
    with open(root / "raw" / "modelnet10_250k.tar.zst", "wb") as f:
        f.write(zstd.ZstdCompressor().compress(tar_buf.getvalue()))

    ds = ModelNet10Dataset(str(root))
    assert len(ds) == 2
    assert ds.num_classes == 2 and ds.classes == [0, 1]
    # /32767 processing semantics, sorted file order
    np.testing.assert_allclose(
        ds[0].x, (files["chair_0001.npy"] / 32767).astype(np.float32)
    )
    assert ds[0].name == "chair_0001" and int(ds[1].y) == 1
    assert (root / "processed" / "_done").exists()
    assert ds.splits == splits["splits"]

    # artifact resume: with raw + _done present, reinstantiation skips
    # download AND process (reference datasets.py:262-287). Corrupt the
    # archive and delete the extracted tree to prove neither is touched;
    # the raw file itself must stay (its absence re-triggers download —
    # that is reference behavior, not resume).
    (root / "raw" / "modelnet10_250k.tar.zst").write_bytes(b"garbage")
    import shutil

    shutil.rmtree(root / "raw" / "modelnet10_250k")
    ds2 = ModelNet10Dataset(str(root))
    assert len(ds2) == 2 and int(ds2[1].y) == 1


def test_checksum_mismatch_warns_not_raises(tmp_path):
    """Reference semantics: a bad checksum WARNS (datasets.py:743-755),
    it does not raise."""
    from flooder_tpu.datasets import ModelNet10Dataset

    f = tmp_path / "payload.bin"
    f.write_bytes(b"not the real archive")
    with pytest.warns(UserWarning, match="checksum"):
        ModelNet10Dataset.validate(
            ModelNet10Dataset.__new__(ModelNet10Dataset), str(f)
        )


def _write_zst_archive(path, folder, entries):
    """entries: {name: payload bytes} written under folder/ in a .tar.zst."""
    zstd = pytest.importorskip("zstandard")
    import io
    import tarfile

    tar_buf = io.BytesIO()
    with tarfile.open(fileobj=tar_buf, mode="w") as tar:
        for name, payload in entries.items():
            info = tarfile.TarInfo(f"{folder}/{name}")
            info.size = len(payload)
            tar.addfile(info, io.BytesIO(payload))
    with open(path, "wb") as f:
        f.write(zstd.ZstdCompressor().compress(tar_buf.getvalue()))


def test_rocks_pipeline_offline(tmp_path):
    """RocksDataset's unpackbits → jittered voxel-coordinate processing
    and regression targets (reference datasets.py:1265-1314), offline."""
    import io

    import yaml

    from flooder_tpu.datasets import RocksDataset

    vol = np.zeros((256, 256, 256), dtype=bool)
    occupied = [(0, 0, 0), (10, 20, 30), (255, 255, 255), (100, 3, 7)]
    for v in occupied:
        vol[v] = True
    buf = io.BytesIO()
    np.save(buf, np.packbits(vol))
    meta = {
        "data": {
            "rock_000.npy": {"label": 1, "target": 2.5, "volume": 0.125}
        }
    }
    splits = {"splits": {"0": {"trn": [0]}}}
    root = tmp_path / "rocks"
    (root / "raw").mkdir(parents=True)
    _write_zst_archive(
        root / "raw" / "rocks.tar.zst",
        "rocks",
        {
            "meta.yaml": yaml.safe_dump(meta).encode(),
            "splits.yaml": yaml.safe_dump(splits).encode(),
            "rock_000.npy": buf.getvalue(),
        },
    )
    ds = RocksDataset(str(root))
    assert len(ds) == 1
    item = ds[0]
    assert item.x.shape == (len(occupied), 3)
    assert item.x.dtype == np.float32
    # voxel coordinate + jitter in [0, 0.1): floor recovers the voxel
    np.testing.assert_array_equal(
        np.floor(item.x).astype(int), sorted(occupied)
    )
    assert ((item.x - np.floor(item.x)) < 0.1).all()
    assert int(item.y) == 1
    assert item.surface == pytest.approx(2.5)
    assert item.volume == pytest.approx(0.125)


def test_large_point_cloud_lazy_get_offline(tmp_path):
    """LargePointCloudDataset: _process must actually EXTRACT (its
    process() only unpacks; nothing creates the _done sentinel, so
    _process runs every time and the isdir guard makes it a no-op once
    extracted — reference datasets.py:1341-1354). A previous
    processed_file_names=[] override made all([]) skip extraction
    entirely, breaking the manual-download path this test drives."""
    torch = pytest.importorskip("torch")
    import io

    import yaml

    from flooder_tpu.datasets import LargePointCloudDataset

    rng = np.random.default_rng(0)
    clouds = [rng.random((30, 3)).astype(np.float32),
              rng.random((20, 3)).astype(np.float32)]
    meta = {
        "data": [
            {"name": "virus", "description": "EMD-50844"},
            {"name": "coral", "description": "USNM 53156"},
        ]
    }
    payloads = {}
    for fname, arr in zip(["virus.pt", "coral.pt"], clouds):
        b = io.BytesIO()
        torch.save(torch.from_numpy(arr), b)
        payloads[fname] = b.getvalue()
    payloads["meta.yaml"] = yaml.safe_dump(meta).encode()
    root = tmp_path / "large"
    (root / "raw").mkdir(parents=True)
    _write_zst_archive(root / "raw" / "large.tar.zst", "large", payloads)

    ds = LargePointCloudDataset(str(root))
    assert len(ds) == 2
    item = ds[0]
    np.testing.assert_array_equal(item.x, clouds[0])
    assert item.name == "virus" and "50844" in item.description
    assert ds[1].name == "coral"
    # lazy: nothing cached between gets, reinstantiation stays cheap
    ds2 = LargePointCloudDataset(str(root))
    np.testing.assert_array_equal(ds2[1].x, clouds[1])
