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
    # crossing DCN must cost efficiency vs staying inside one ICI
    # domain (the absolute value depends on the bench-fed compute
    # constants, so the assertion is relative)
    r_pod = predict_scaling(1 << 22, 256)
    assert r["efficiency"] < r_pod["efficiency"] - 0.02


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


def test_calibration_reads_bench_json(tmp_path):
    """The model's stage costs come from the newest BENCH_r*.json when
    the fields are present (VERDICT r3 item 5: bench-fed, not
    hand-entered)."""
    import importlib
    import json
    import os

    from meryl_tpu.parallel import scaling as sc

    p = tmp_path / "BENCH_r99.json"
    p.write_text(json.dumps({
        "metric": "x", "t_local_ns_per_base": 5.5,
        "t_merge_ns_per_elt": 2.25}) + "\n")
    old = os.environ.get("MERYL_TPU_BENCH_JSON")
    os.environ["MERYL_TPU_BENCH_JSON"] = str(p)
    try:
        importlib.reload(sc)
        assert sc.T_LOCAL_NS_PER_BASE == 5.5
        assert sc.T_MERGE_NS_PER_ELT == 2.25
        assert sc.CALIBRATION["t_local_src"] == "BENCH_r99.json"
        r = sc.predict_scaling(1 << 22, 8)
        assert abs(r["t_local_ms"] - (1 << 22) * 5.5e-6) < 1e-3
    finally:
        if old is None:
            os.environ.pop("MERYL_TPU_BENCH_JSON", None)
        else:
            os.environ["MERYL_TPU_BENCH_JSON"] = old
        importlib.reload(sc)


def test_calibration_env_override_beats_file():
    import importlib
    import os

    from meryl_tpu.parallel import scaling as sc

    os.environ["MERYL_TPU_T_LOCAL_NS"] = "9.0"
    try:
        importlib.reload(sc)
        assert sc.T_LOCAL_NS_PER_BASE == 9.0
        assert sc.CALIBRATION["t_local_src"] == "env"
    finally:
        os.environ.pop("MERYL_TPU_T_LOCAL_NS", None)
        importlib.reload(sc)


def test_generation_table_selects_ici():
    import importlib
    import os

    from meryl_tpu.parallel import scaling as sc

    os.environ["MERYL_TPU_GEN"] = "v5p"
    try:
        importlib.reload(sc)
        assert sc.ICI_GB_S == 200.0 and sc.DCN_GB_S == 25.0
    finally:
        os.environ.pop("MERYL_TPU_GEN", None)
        importlib.reload(sc)
