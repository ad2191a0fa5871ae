"""Provenance rules for the e2e demo's summary collection.

The e2e report is resumable across runs/machines; the summary must never
silently pair metrics from different model versions (advisor findings,
round 3): when a stage re-runs, everything measured downstream of it before
this invocation is dropped, and values carried from a previous report are
tagged as carried.
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "cli"))

import e2e_demo  # noqa: E402


def _ws(tmp_path, *, vae=True, classifier=True, gen=0, serving=0):
    ws = tmp_path
    if vae:
        vr = ws / "vae_reconstruction"
        vr.mkdir(parents=True, exist_ok=True)
        (vr / "metrics.json").write_text(json.dumps(
            {"mean_psnr": 31.2, "mean_ssim": 0.93, "verdict": "very good"}))
    if classifier:
        (ws / "classifier_real.json").write_text('{"accuracy": 0.44}')
        (ws / "classifier_synth.json").write_text('{"accuracy": 0.55}')
    gen_dir = ws / "generated"
    for i in range(gen):
        d = gen_dir / "ID_1"
        d.mkdir(parents=True, exist_ok=True)
        (d / f"generated_{i:03d}.jpg").write_bytes(b"x")
    for i in range(serving):
        d = ws / "serving" / "generated" / "ID_1"
        d.mkdir(parents=True, exist_ok=True)
        (d / f"generated_{i:03d}.jpg").write_bytes(b"x")
    return ws, gen_dir


def test_invalidation_is_transitive_downstream():
    inv = e2e_demo.invalidated_stages({"kl_vae"})
    assert {"kl_vae", "vae_report", "gmm", "ldm", "generate", "serving",
            "classifier"} <= inv
    # the vqgan side branch hangs off the split, not the VAE
    assert "vqgan" not in inv and "diagnose" not in inv and "data" not in inv


def test_vqgan_branch_does_not_invalidate_classifier():
    inv = e2e_demo.invalidated_stages({"vqgan"})
    assert inv == {"vqgan", "diagnose"}


def test_fresh_measurement_gets_timestamp(tmp_path):
    ws, gen_dir = _ws(tmp_path, gen=3, serving=2)
    report = {"summary": {}, "summary_provenance": {}}
    e2e_demo.collect_summary(
        ws, report, ran={"vae_report", "classifier", "generate", "serving"},
        gen_dir=gen_dir, now="NOW")
    s, p = report["summary"], report["summary_provenance"]
    assert s["vae_psnr"] == 31.2 and s["generated_images"] == 3
    assert s["serving_images"] == 2
    assert p["vae_psnr"] == {"stage": "vae_report", "measured_at": "NOW"}
    assert p["classifier_acc_real"]["measured_at"] == "NOW"
    assert not any(v.get("carried") for v in p.values())


def test_upstream_rerun_drops_stale_downstream_metrics(tmp_path):
    """kl_vae re-ran but vae_report/classifier did not: their artifacts
    still exist on disk yet describe the OLD VAE — they must be dropped,
    not re-read (the round-3 advisor finding)."""
    ws, gen_dir = _ws(tmp_path, gen=5)
    report = {"summary": {"vae_psnr": 27.0, "classifier_acc_real": 0.4,
                          "generated_images": 5},
              "summary_provenance": {}}
    e2e_demo.collect_summary(ws, report, ran={"kl_vae"},
                             gen_dir=gen_dir, now="NOW")
    assert report["summary"] == {}


def test_partial_refresh_keeps_only_remeasured_keys(tmp_path):
    """kl_vae + vae_report re-ran; classifier/generate did not → the fresh
    VAE numbers land, the stale downstream ones are dropped."""
    ws, gen_dir = _ws(tmp_path, gen=5)
    report = {"summary": {"vae_psnr": 27.0, "classifier_acc_real": 0.4,
                          "generated_images": 5},
              "summary_provenance": {}}
    e2e_demo.collect_summary(ws, report, ran={"kl_vae", "vae_report"},
                             gen_dir=gen_dir, now="NOW")
    s = report["summary"]
    assert s["vae_psnr"] == 31.2
    assert "classifier_acc_real" not in s and "generated_images" not in s
    assert report["summary_provenance"]["vae_psnr"]["measured_at"] == "NOW"


def test_absent_artifact_carries_previous_value_tagged(tmp_path):
    """Nothing re-ran; the classifier artifacts measured on another machine
    are absent here → previous values survive but are tagged carried."""
    ws, gen_dir = _ws(tmp_path, classifier=False)
    report = {
        "summary": {"vae_psnr": 27.0, "classifier_acc_real": 0.4},
        "summary_provenance": {
            "classifier_acc_real": {"stage": "classifier",
                                    "measured_at": "BEFORE"}}}
    e2e_demo.collect_summary(ws, report, ran=set(),
                             gen_dir=gen_dir, now="NOW")
    s, p = report["summary"], report["summary_provenance"]
    # vae metrics re-read from the (non-stale) artifact on disk
    assert s["vae_psnr"] == 31.2
    assert p["vae_psnr"]["measured_at"] == "pre-existing artifact"
    # classifier value carried, tagged, original timestamp preserved
    assert s["classifier_acc_real"] == 0.4
    assert p["classifier_acc_real"] == {
        "stage": "classifier", "measured_at": "BEFORE", "carried": True}


def test_carried_value_still_dropped_when_stale(tmp_path):
    ws, gen_dir = _ws(tmp_path, vae=False, classifier=False)
    report = {"summary": {"classifier_acc_real": 0.4},
              "summary_provenance": {}}
    e2e_demo.collect_summary(ws, report, ran={"ldm"},
                             gen_dir=gen_dir, now="NOW")
    assert "classifier_acc_real" not in report["summary"]
