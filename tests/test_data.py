"""Data pipeline tests: reference-exact normalization/split semantics,
iterator protocol, per-file dataset, edges2shoes, climate loader, native
C++ loader parity."""

import os

import numpy as np
import pytest

from domain_transfer_gan_tpu.data import (
    AlignedIterator,
    ClimateSegLoader,
    DataLoader,
    UnalignedIterator,
    load_numpy_data,
    py2_seed123_permutation,
)
from domain_transfer_gan_tpu.data.npz import normalize_bundle
from domain_transfer_gan_tpu.data.synthetic import (
    write_synthetic_dataset,
    write_synthetic_perfile_dataset,
)


def test_py2_seed123_permutation_exact():
    """First elements of the py2 random.seed(123) shuffle of range(10) —
    golden values from the Fisher-Yates + MT float stream replay."""
    idx = py2_seed123_permutation(10)
    # deterministic: same call twice
    np.testing.assert_array_equal(idx, py2_seed123_permutation(10))
    # a permutation
    assert sorted(idx.tolist()) == list(range(10))
    # python2's shuffle for n=3, seed=123: j-sequence from MT floats
    import random
    r = random.Random(123)
    expect = list(range(3))
    for i in reversed(range(1, 3)):
        j = int(r.random() * (i + 1))
        expect[i], expect[j] = expect[j], expect[i]
    np.testing.assert_array_equal(py2_seed123_permutation(3), expect)


def test_normalize_bundle_semantics():
    rng = np.random.RandomState(0)
    x = rng.uniform(5, 10, (4, 6, 6, 3)).astype(np.float32)
    x[0, 0, 0, 0] = np.nan
    out = normalize_bundle(x.copy(), use_native=False)
    assert out.dtype == np.float32
    # per-sample-per-channel min is -1 and max is +1
    assert np.allclose(out.min(axis=(1, 2)), -1, atol=1e-5)
    assert np.allclose(out.max(axis=(1, 2)), 1, atol=1e-5)


def test_normalize_constant_channel_is_scrubbed():
    x = np.full((1, 4, 4, 1), 7.0, np.float32)
    out = normalize_bundle(x, use_native=False)
    assert np.all(np.isfinite(out))


def test_native_normalize_matches_numpy():
    from domain_transfer_gan_tpu.data import native
    if not native.native_available():
        pytest.skip("native library not built")
    rng = np.random.RandomState(1)
    x = rng.randn(8, 16, 16, 3).astype(np.float32)
    x[0, 0, 0, 0] = np.nan
    want = normalize_bundle(x.copy(), use_native=False)
    got = x.copy()
    assert native.normalize_batch_inplace(got)
    np.testing.assert_array_equal(got, want)


def test_native_npz_read(tmp_path):
    from domain_transfer_gan_tpu.data import native
    if not native.native_available():
        pytest.skip("native library not built")
    rng = np.random.RandomState(2)
    x = rng.randn(5, 7, 3).astype(np.float32)
    p1 = str(tmp_path / "stored.npz")
    p2 = str(tmp_path / "deflate.npz")
    np.savez(p1, data=x)
    np.savez_compressed(p2, data=x)
    np.testing.assert_array_equal(native.read_npz_f32(p1), x)
    np.testing.assert_array_equal(native.read_npz_f32(p2), x)


def test_load_numpy_data_contract(tmp_path):
    root = write_synthetic_dataset(str(tmp_path), n_train=30, n_test=10,
                                   size=16)
    trA, trB, devA, devB, teA, teB = load_numpy_data(root, dev_size=8)
    assert devA.shape[0] == 8 and trA.shape[0] == 22
    assert teA.shape == (10, 16, 16, 3)
    # A/B stay aligned through the shuffle
    trA2, trB2, *_ = load_numpy_data(root, dev_size=8)
    np.testing.assert_array_equal(trA, trA2)
    np.testing.assert_array_equal(trB, trB2)
    # everything normalized to [-1, 1]
    assert trA.min() >= -1 - 1e-5 and trA.max() <= 1 + 1e-5


def test_load_numpy_data_resize(tmp_path):
    root = write_synthetic_dataset(str(tmp_path), n_train=12, n_test=4,
                                   size=16)
    trA, *_ = load_numpy_data(root, grid_size=8, dev_size=4)
    assert trA.shape[1:] == (8, 8, 3)


def test_aligned_iterator_protocol():
    A = np.arange(10)[:, None].repeat(3, 1).astype(np.float32)
    B = A + 100
    it = AlignedIterator(A, B, batch_size=4)
    batches = list(it)
    assert [b["A"].shape[0] for b in batches] == [4, 4, 2]
    # aligned: same indices in A and B
    for b in batches:
        np.testing.assert_array_equal(b["A"] + 100, b["B"])
    # StopIteration auto-resets
    batches2 = list(it)
    assert len(batches2) == 3


def test_unaligned_iterator_full_batches():
    A = np.arange(10)[:, None].astype(np.float32)
    B = A.copy()
    it = UnalignedIterator(A, B, batch_size=4)
    batches = list(it)
    # last-batch backoff: every batch full-size (reference dataloader.py:144-145)
    assert all(b["A"].shape[0] == 4 for b in batches)
    assert len(batches) == 3
    assert len(it) == 10


def test_perfile_dataset_and_loader(tmp_path):
    class Opt:
        dataroot = str(tmp_path)
        grid_size = 16
        nThreads = 2

    write_synthetic_perfile_dataset(str(tmp_path), n_train=12, n_test=4,
                                    size=16)
    # dev/train split honors DEV_SIZE; with only 12 files dev gets them all,
    # so use subset='test' for content checks
    loader = DataLoader(Opt(), subset="test", unaligned=False, batchSize=3)
    batches = list(loader)
    assert batches[0]["A"].shape == (3, 16, 16, 3)
    assert len(loader) == 4
    # values mapped to [-1, 1] by the transform
    assert batches[0]["A"].min() >= -1.0001


def test_climate_loader(tmp_path):
    # climate files store (16 channels, npoints) rasters + one-hot labels
    # (the reference's per-channel mean/std are (16, 1) column vectors,
    # simpleloader.py:26-27)
    files = []
    rng = np.random.RandomState(3)
    for i in range(3):
        f = tmp_path / f"c{i}.npz"
        np.savez(str(f), data=rng.randn(16, 64).astype(np.float32),
                 labels=np.eye(4)[rng.randint(0, 4, 64)].T)
        files.append(f"c{i}.npz")
    with open(tmp_path / "train_split.txt", "w") as f:
        f.write("\n".join(files))
    dl = ClimateSegLoader(str(tmp_path), "train", split_dir=str(tmp_path))
    assert len(dl) == 3
    data, labels = dl[0]
    assert data.shape == (16, 64)
    assert labels.shape == (64,)
    assert labels.max() < 4


def test_edges2shoes_folder_layout(tmp_path):
    from PIL import Image
    from domain_transfer_gan_tpu.data import load_edges2shoes
    rng = np.random.RandomState(4)
    for sub, n in (("train", 6), ("val", 3)):
        os.makedirs(tmp_path / sub)
        for i in range(n):
            img = (rng.rand(32, 64, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(tmp_path / sub / f"{i}.jpg")
    trA, trB, devA, devB, teA, teB = load_edges2shoes(
        str(tmp_path), size=16, dev_size=2)
    assert trA.shape == (4, 16, 16, 3) and devA.shape[0] == 2
    assert teA.shape == (3, 16, 16, 3)
    assert trA.min() >= -1.001 and trA.max() <= 1.001


def test_native_loader_rejects_corrupt_and_overdeep_files(tmp_path):
    """Malformed inputs must come back as errors (None through the ctypes
    wrapper), never crash: a corrupt size field used to bad_alloc straight
    through the C ABI / batch worker threads (std::terminate), and a 9-D
    npy overflowed the shape[8] out-array contract."""
    import struct
    import zipfile

    from domain_transfer_gan_tpu.data import native
    if not native.native_available():
        pytest.skip("native library not built")

    ok = str(tmp_path / "ok.npz")
    np.savez(ok, data=np.arange(12, dtype=np.float32).reshape(3, 4))
    np.testing.assert_array_equal(
        native.read_npz_f32(ok),
        np.arange(12, dtype=np.float32).reshape(3, 4))

    nine = str(tmp_path / "nine.npy")
    np.save(nine, np.zeros((1,) * 9, np.float32))
    assert native.read_npz_f32(nine) is None

    with zipfile.ZipFile(str(tmp_path / "c.npz"), "w",
                         zipfile.ZIP_DEFLATED) as z:
        z.writestr("data.npy", open(nine, "rb").read())
    blob = bytearray(open(str(tmp_path / "c.npz"), "rb").read())
    i = blob.find(b"PK\x03\x04")
    struct.pack_into("<I", blob, i + 22, 0xFFFFFFFF)  # lie about raw size
    corrupt = str(tmp_path / "corrupt.npz")
    open(corrupt, "wb").write(bytes(blob))
    assert native.read_npz_f32(corrupt) is None
    # batch path: one bad file -> clean failure, process survives
    assert native.load_batch_f32([ok, corrupt], 3, 4, 1,
                                 normalize=False) is None


def test_native_loader_fuzz_random_mutations(tmp_path):
    """Random byte flips over a valid npz must never hang or crash the
    reader (fuzz-found: a corrupt shape tuple spun strtoll forever; a
    shape larger than the payload read out of bounds)."""
    from domain_transfer_gan_tpu.data import native
    if not native.native_available():
        pytest.skip("native library not built")
    rng = np.random.RandomState(0)
    src = str(tmp_path / "fz.npz")
    np.savez(src, data=rng.rand(8, 8, 3).astype(np.float32))
    blob = bytearray(open(src, "rb").read())
    mut = str(tmp_path / "fz_mut.npz")
    for _ in range(150):
        b = bytearray(blob)
        for _ in range(rng.randint(1, 8)):
            b[rng.randint(len(b))] = rng.randint(256)
        open(mut, "wb").write(bytes(b))
        native.read_npz_f32(mut)  # any result is fine; returning is the test


def test_native_loader_rejects_shape_payload_mismatch(tmp_path):
    """A header whose shape claims more elements than the payload holds
    must be rejected (OOB-read guard), and garbage in the shape tuple must
    error instead of looping."""
    from domain_transfer_gan_tpu.data import native
    if not native.native_available():
        pytest.skip("native library not built")
    p = str(tmp_path / "x.npy")
    np.save(p, np.zeros((4, 4), np.float32))
    blob = bytearray(open(p, "rb").read())
    hdr = bytes(blob).find(b"(4, 4)")
    oversize = bytes(blob).replace(b"(4, 4)", b"(444444, 4)" + b" " * 0)
    # keep header length fields consistent: only same-length rewrites
    same_len = bytes(blob).replace(b"(4, 4)", b"(4,44)")
    open(str(tmp_path / "big.npy"), "wb").write(same_len)
    out = native.read_npz_f32(str(tmp_path / "big.npy"))
    assert out is None  # 4*44 elements > 16-element payload
    garbage = bytes(blob).replace(b"(4, 4)", b"(4, x)")
    open(str(tmp_path / "bad.npy"), "wb").write(garbage)
    assert native.read_npz_f32(str(tmp_path / "bad.npy")) is None
    assert hdr > 0


def test_prep_livneh_etl_from_netcdf(tmp_path):
    """The Livneh ETL (reference notebook port, data/prep_livneh.py) reads a
    real NetCDF file (classic format via the scipy fallback — the optional
    netCDF4 package is absent here), stacks the forcing/SWE variables,
    splits 80/20 chronologically, and writes BOTH loader formats."""
    from scipy.io import netcdf_file

    from domain_transfer_gan_tpu.data.prep_livneh import prepare

    T, H, W = 10, 6, 5
    rng = np.random.RandomState(0)

    def write_nc(path, var_names):
        with netcdf_file(str(path), "w") as ds:
            ds.createDimension("time", T)
            ds.createDimension("lat", H)
            ds.createDimension("lon", W)
            for dim, n in (("time", T), ("lat", H), ("lon", W)):
                v = ds.createVariable(dim, "f4", (dim,))
                v[:] = np.arange(n, dtype=np.float32)
            out = {}
            for name in var_names:
                v = ds.createVariable(name, "f4", ("time", "lat", "lon"))
                arr = rng.rand(T, H, W).astype(np.float32)
                v[:] = arr
                out[name] = arr
        return out

    forc = write_nc(tmp_path / "forcings.nc",
                    ["Prec", "Tmax", "Tmin", "wind"])
    swe = write_nc(tmp_path / "swe.nc", ["SWE"])
    out = tmp_path / "npz"
    prepare(str(tmp_path / "forcings.nc"), str(tmp_path / "swe.nc"),
            str(out))

    with np.load(out / "trainA.npz") as z:
        trainA = z["data"]
        assert set(z.files) >= {"data", "lat", "lon", "time"}
    with np.load(out / "testB.npz") as z:
        testB = z["data"]
    assert trainA.shape == (8, H, W, 4)      # 80% of 10, chronological
    assert testB.shape == (2, H, W, 1)
    np.testing.assert_array_equal(trainA[..., 0], forc["Prec"][:8])
    np.testing.assert_array_equal(testB[..., 0], swe["SWE"][8:])
    # per-sample format, loadable by the per-file dataset path
    assert sorted(os.listdir(out / "trainA"))[0] == "00000.npz"
    with np.load(out / "testA" / "00000.npz") as z:
        np.testing.assert_array_equal(
            z["data"][..., 1], forc["Tmax"][8])


def test_livneh_shaped_dataset_loads():
    """The fork's science config shape (reference README.md:3): A = 4
    atmospheric channels with a NaN ocean mask -> 3-channel cap
    (dataloader.py:17), B = 1-channel SWE.  The loader must scrub every
    NaN and deliver normalized [-1,1] rasters at the capped widths."""
    import tempfile

    from domain_transfer_gan_tpu.data.synthetic import (
        make_synthetic_livneh_pair,
        write_synthetic_livneh_dataset,
    )
    A, B = make_synthetic_livneh_pair(8, size=32, seed=0)
    assert A.shape == (8, 32, 32, 4) and B.shape == (8, 32, 32, 1)
    assert np.isnan(A).any() and np.isnan(B).any()
    # the NaN mask is shared across channels/domains (raster semantics)
    np.testing.assert_array_equal(np.isnan(A[..., 0]), np.isnan(A[..., 3]))
    np.testing.assert_array_equal(np.isnan(A[..., 0]), np.isnan(B[..., 0]))

    with tempfile.TemporaryDirectory() as root:
        write_synthetic_livneh_dataset(root, n_train=216, n_test=8, size=32)
        trA, trB, devA, devB, teA, teB = load_numpy_data(root)
    assert trA.shape[-1] == 3 and teA.shape[-1] == 3  # 4 -> 3 cap
    assert trB.shape[-1] == 1 and teB.shape[-1] == 1
    for x in (trA, trB, devA, devB, teA, teB):
        assert np.isfinite(x).all()
        assert x.min() >= -1.0 - 1e-6 and x.max() <= 1.0 + 1e-6
