import numpy as np
import pytest

from medical_image_generation_tpu.io import nifti
from medical_image_generation_tpu.io import volstore


class TestNifti:
    def test_roundtrip_float32(self, tmp_path):
        rng = np.random.default_rng(0)
        data = rng.normal(size=(13, 17, 9)).astype(np.float32)
        affine = np.diag([1.5, 0.7, 2.0, 1.0])
        path = str(tmp_path / "vol.nii.gz")
        nifti.save_nifti(path, data, affine)
        img = nifti.load_nifti(path)
        np.testing.assert_allclose(img.data, data, rtol=1e-6)
        np.testing.assert_allclose(img.affine, affine, rtol=1e-6)
        np.testing.assert_allclose(img.spacing, [1.5, 0.7, 2.0], rtol=1e-6)

    def test_roundtrip_uncompressed_int16(self, tmp_path):
        data = (np.arange(4 * 5 * 6).reshape(4, 5, 6) % 100).astype(np.int16)
        path = str(tmp_path / "vol.nii")
        nifti.save_nifti(path, data)
        img = nifti.load_nifti(path)
        np.testing.assert_array_equal(img.data, data)

    def test_4d_roundtrip(self, tmp_path):
        data = np.random.default_rng(1).normal(size=(8, 9, 10, 2)).astype(np.float32)
        path = str(tmp_path / "vol4d.nii.gz")
        nifti.save_nifti(path, data)
        img = nifti.load_nifti(path)
        assert img.data.shape == (8, 9, 10, 2)
        np.testing.assert_allclose(img.data, data, rtol=1e-6)

    def test_extract_spacing_header_only(self, tmp_path):
        data = np.zeros((5, 5, 5), dtype=np.float32)
        affine = np.diag([0.5, 0.5, 3.0, 1.0])
        path = str(tmp_path / "sp.nii.gz")
        nifti.save_nifti(path, data, affine)
        np.testing.assert_allclose(nifti.extract_spacing(path), [0.5, 0.5, 3.0], rtol=1e-6)

    def test_slope_zero_means_no_scaling(self, tmp_path):
        # NIfTI-1 spec: scl_slope == 0 means no scaling; a stale scl_inter
        # must be ignored (not applied as an intensity shift)
        import struct

        data = (np.arange(3 * 4 * 5).reshape(3, 4, 5) % 50).astype(np.int16)
        path = str(tmp_path / "slope0.nii")
        nifti.save_nifti(path, data)
        raw = bytearray(open(path, "rb").read())
        struct.pack_into("<f", raw, 112, 0.0)  # scl_slope = 0
        struct.pack_into("<f", raw, 116, 100.0)  # garbage scl_inter
        open(path, "wb").write(bytes(raw))
        img = nifti.load_nifti(path)
        np.testing.assert_array_equal(img.data, data)

    def test_slope_applied_when_meaningful(self, tmp_path):
        import struct

        data = np.arange(2 * 3 * 4).reshape(2, 3, 4).astype(np.int16)
        path = str(tmp_path / "slope2.nii")
        nifti.save_nifti(path, data)
        raw = bytearray(open(path, "rb").read())
        struct.pack_into("<f", raw, 112, 2.0)
        struct.pack_into("<f", raw, 116, 10.0)
        open(path, "wb").write(bytes(raw))
        img = nifti.load_nifti(path)
        np.testing.assert_allclose(img.data, data * 2.0 + 10.0)

    def test_get_fdata(self, tmp_path):
        data = np.ones((3, 3, 3), dtype=np.float32)
        path = str(tmp_path / "f.nii.gz")
        nifti.save_nifti(path, data)
        out = nifti.load_nifti(path).get_fdata()
        assert out.dtype == np.float64


class TestVolStore:
    @pytest.mark.parametrize("dtype", [np.float32, np.uint8, np.int16])
    def test_roundtrip_full(self, tmp_path, dtype):
        rng = np.random.default_rng(2)
        if dtype == np.float32:
            arr = rng.normal(size=(2, 7, 33, 29)).astype(dtype)
        else:
            arr = rng.integers(0, 100, size=(2, 7, 33, 29)).astype(dtype)
        path = str(tmp_path / "v.vs")
        volstore.write_volume(path, arr)
        vs = volstore.open_volume(path)
        assert vs.shape == arr.shape
        assert vs.dtype == arr.dtype
        np.testing.assert_array_equal(vs.read_full(), arr)

    def test_bbox_inside(self, tmp_path):
        arr = np.random.default_rng(3).normal(size=(1, 10, 20, 22)).astype(np.float32)
        path = str(tmp_path / "v.vs")
        volstore.write_volume(path, arr, chunk_shape=(1, 1, 20, 22))
        vs = volstore.open_volume(path)
        got = vs.read_bbox([0, 2, 3, 4], [1, 5, 13, 16])
        np.testing.assert_array_equal(got, arr[0:1, 2:5, 3:13, 4:16])

    def test_bbox_out_of_bounds_zero_padded(self, tmp_path):
        """crop_and_pad_nd semantics: OOB regions are zero-filled
        (reference data_processing.py:148-225)."""
        arr = np.random.default_rng(4).normal(size=(1, 4, 8, 8)).astype(np.float32)
        path = str(tmp_path / "v.vs")
        volstore.write_volume(path, arr)
        vs = volstore.open_volume(path)
        got = vs.read_bbox([0, -2, -3, 4], [1, 6, 9, 12])
        assert got.shape == (1, 8, 12, 8)
        expected = np.zeros((1, 8, 12, 8), dtype=np.float32)
        expected[:, 2:6, 3:11, 0:4] = arr[:, 0:4, 0:8, 4:8]
        np.testing.assert_array_equal(got, expected)

    def test_bbox_fully_outside(self, tmp_path):
        arr = np.ones((1, 3, 4, 4), dtype=np.float32)
        path = str(tmp_path / "v.vs")
        volstore.write_volume(path, arr)
        vs = volstore.open_volume(path)
        got = vs.read_bbox([0, 10, 0, 0], [1, 12, 4, 4])
        assert got.shape == (1, 2, 4, 4)
        assert np.all(got == 0)

    def test_getitem(self, tmp_path):
        arr = np.random.default_rng(5).normal(size=(2, 6, 10, 12)).astype(np.float32)
        path = str(tmp_path / "v.vs")
        volstore.write_volume(path, arr)
        vs = volstore.open_volume(path)
        np.testing.assert_array_equal(vs[0, 2:4, :, 3:7], arr[0, 2:4, :, 3:7])
        np.testing.assert_array_equal(vs[1], arr[1])

    def test_3d_label_volume(self, tmp_path):
        arr = np.random.default_rng(6).integers(0, 4, size=(9, 15, 17)).astype(np.uint8)
        path = str(tmp_path / "lbl.vs")
        volstore.write_volume(path, arr, chunk_shape=(1, 15, 17))
        vs = volstore.open_volume(path)
        np.testing.assert_array_equal(vs.read_full(), arr)

    def test_python_fallback_roundtrip(self, tmp_path, monkeypatch):
        """The zlib fallback must interoperate with its own writes."""
        monkeypatch.setattr(volstore, "_lib", None)
        monkeypatch.setattr(volstore, "_lib_failed", True)
        arr = np.random.default_rng(7).normal(size=(1, 5, 9, 11)).astype(np.float32)
        path = str(tmp_path / "py.vs")
        volstore.write_volume(path, arr)
        vs = volstore.open_volume(path)
        assert vs.codec.startswith("zlib")
        np.testing.assert_array_equal(vs.read_full(), arr)
        got = vs.read_bbox([0, -1, 2, 3], [1, 6, 11, 9])
        expected = np.zeros((1, 7, 9, 6), dtype=np.float32)
        expected[:, 1:6, 0:7, 0:6] = arr[:, 0:5, 2:9, 3:9]
        np.testing.assert_array_equal(got, expected)


class TestVolStoreConcurrency:
    def test_concurrent_bbox_reads(self, tmp_path):
        """The prefetch loader reads one store from many threads."""
        import concurrent.futures

        rng = np.random.default_rng(8)
        arr = rng.normal(size=(1, 16, 64, 64)).astype(np.float32)
        path = str(tmp_path / "c.vs")
        volstore.write_volume(path, arr, chunk_shape=(1, 1, 64, 64))
        vs = volstore.open_volume(path)

        def read(i):
            z = i % 12
            got = vs.read_bbox([0, z, 0, 0], [1, z + 4, 64, 64])
            expected = np.zeros((1, 4, 64, 64), np.float32)
            upper = min(z + 4, 16)
            expected[:, : upper - z] = arr[:, z:upper]
            np.testing.assert_array_equal(got, expected)
            return True

        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
            assert all(ex.map(read, range(64)))
