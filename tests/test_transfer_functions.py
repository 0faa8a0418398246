"""PQ/HLG transfer functions + tone mapping
(reference: cms/transfer_functions_test.cc, tone_mapping_test.cc)."""

import numpy as np
import pytest

from libjxl_tpu.color.transfer_functions import (
    hlg_display_from_encoded, hlg_encoded_from_display,
    pq_display_from_encoded, pq_encoded_from_display, rec2408_tone_map,
)


def test_pq_roundtrip():
    x = np.linspace(0, 1, 1000)
    back = pq_encoded_from_display(pq_display_from_encoded(x))
    np.testing.assert_allclose(back, x, atol=1e-9)


def test_pq_known_values():
    # PQ(0.58) ~ 100 nits (of 10000); e=1 -> peak.
    assert pq_display_from_encoded(np.array(1.0)) == pytest.approx(1.0)
    nits100 = pq_display_from_encoded(np.array(0.508078421517399))
    assert nits100 * 10000 == pytest.approx(100.0, rel=1e-3)


def test_hlg_roundtrip():
    x = np.linspace(0, 1, 1000)
    back = hlg_encoded_from_display(hlg_display_from_encoded(x))
    np.testing.assert_allclose(back, x, atol=1e-9)


def test_hlg_breakpoints():
    assert hlg_display_from_encoded(np.array(0.5)) == pytest.approx(1 / 12)
    assert hlg_encoded_from_display(np.array(1.0)) == pytest.approx(1.0,
                                                                    abs=2e-3)


def test_negative_mirroring():
    for f in (pq_display_from_encoded, pq_encoded_from_display,
              hlg_display_from_encoded, hlg_encoded_from_display):
        v = f(np.array([0.25]))
        nv = f(np.array([-0.25]))
        np.testing.assert_allclose(nv, -v)


def test_tone_map_preserves_sdr_black_and_compresses_peaks():
    rgb = np.array([[[0.0, 0.0, 0.0]], [[1.0, 1.0, 1.0]],
                    [[0.001, 0.001, 0.001]]])
    out = rec2408_tone_map(rgb, source_range=(0, 10000),
                           target_range=(0, 255))
    assert np.all(out[0] <= 1e-4)
    # 10000-nit white mapped into the 255-nit display range (<= 1.0).
    assert np.all(out[1] <= 1.0 + 1e-6)
    assert out[1, 0, 0] > 0.9
    # dim pixels roughly preserved in display-relative terms
    assert out[2, 0, 0] > 0.0


class TestHdrTools:
    """tools/hdr/{pq_to_hlg,tone_map,render_hlg}.cc CLI equivalents."""

    def _pq_image(self, tmp_path):
        from libjxl_tpu.color.transfer_functions import (
            pq_encoded_from_display)
        yy, xx = np.mgrid[0:32, 0:48]
        nits = (xx / 47.0) ** 2 * 2000.0
        rgb = np.stack([nits, nits * 0.8, nits * 0.6], -1) / 10000.0
        path = str(tmp_path / "pq.npy")
        np.save(path, pq_encoded_from_display(rgb, 10000.0
                                              ).astype(np.float32))
        return path, nits

    def test_tone_map_monotone_sdr(self, tmp_path):
        import libjxl_tpu.cli.hdr_tools as ht
        from PIL import Image
        src, _ = self._pq_image(tmp_path)
        out = str(tmp_path / "sdr.png")
        assert ht.main(["tone_map", src, out, "-t", "100"]) == 0
        sdr = np.asarray(Image.open(out))
        assert sdr.shape == (32, 48, 3)
        row = sdr[16, :, 0].astype(int)
        assert np.all(np.diff(row) >= 0)          # luminance order kept
        assert sdr.max() >= 250                   # peak maps near white

    def test_pq_to_hlg_then_render(self, tmp_path):
        import libjxl_tpu.cli.hdr_tools as ht
        from PIL import Image
        src, _ = self._pq_image(tmp_path)
        hlg = str(tmp_path / "hlg.npy")
        out = str(tmp_path / "render.png")
        assert ht.main(["pq_to_hlg", src, hlg]) == 0
        h = np.load(hlg)
        assert 0.0 <= h.min() and h.max() <= 1.0
        assert ht.main(["render_hlg", hlg, out, "-t", "400"]) == 0
        ren = np.asarray(Image.open(out))
        assert np.all(np.diff(ren[16, :, 0].astype(int)) >= 0)
