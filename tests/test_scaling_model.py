"""Sanity checks for the analytic multi-chip scaling model
(parallel/scaling.py) and its -C plan printout."""

import io

import numpy as np

from meryl_tpu.parallel.scaling import predict_scaling, scaling_report


def test_single_device_is_unity():
    r = predict_scaling(1 << 22, 1)
    assert r["efficiency"] == 1.0
    assert r["t_ici_ms"] == 0.0 and r["t_dcn_ms"] == 0.0


def test_intra_pod_efficiency_holds():
    """The >= 80% north star is intra-pod (the all-to-all rides ICI)."""
    for n in (2, 8, 16, 64, 256):
        r = predict_scaling(1 << 22, n)
        assert r["t_dcn_ms"] == 0.0
        assert r["efficiency"] >= 0.8, (n, r)


def test_multi_pod_is_dcn_bound():
    r = predict_scaling(1 << 22, 1024, ici_domain=256)
    assert r["t_dcn_ms"] > r["t_ici_ms"]
    assert r["efficiency"] < 0.8


def test_throughput_scales_with_devices():
    rates = [predict_scaling(1 << 22, n)["bases_per_s"]
             for n in (1, 8, 64)]
    assert rates[1] > 6 * rates[0]
    assert rates[2] > 6 * rates[1]


def test_report_shape():
    rows = scaling_report(1 << 22)
    assert [r["devices"] for r in rows] == [8, 64, 256]


def test_cli_configure_prints_model(tmp_path, capsys):
    from meryl_tpu import cli
    fa = tmp_path / "r.fa"
    rng = np.random.default_rng(0)
    fa.write_text(">r\n" + "".join(
        "ACTG"[c] for c in rng.integers(0, 4, 500)) + "\n")
    import sys
    err = io.StringIO()
    old = sys.stderr
    sys.stderr = err
    try:
        cli.main(["-C", "count", "k=21", str(fa), "output",
                  str(tmp_path / "o.meryl")])
    finally:
        sys.stderr = old
    text = err.getvalue()
    assert "predicted scaling" in text
    assert "256 devices" in text
