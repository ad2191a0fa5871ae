#!/usr/bin/env python
"""End-to-end two-stage pipeline demo on real hardware.

Drives the COMPLETE reference workflow (SURVEY.md §3 call stacks) through
this framework's public CLI surface — every stage is a subprocess of the
same `cli/*.py` entry point a user would run, at reduced step counts so the
whole pipeline finishes in well under an hour on one chip:

  1. data        synthetic micro-Doppler-like dataset ID_1..ID_31
                 (per-user banded gratings: the class signal a gait
                 spectrogram carries, reference load_dataset.py:14)
  2. split       cli/create_data_split.py --verify
  3. kl_vae      cli/train_kl_vae.py            (stage 1, LDM path)
  4. vae_report  cli/test_vae_reconstruction.py (PSNR/SSIM verdict)
  5. gmm         cli/preprocess_latents_with_gmm.py (GMM split + cache)
  6. ldm         cli/train_latent_cfg.py        (stage 2, CFG U-Net)
  7. generate    cli/generate.py --all_users    (ID_X/generated_###.jpg)
  8. vqgan       cli/train_vqgan.py             (stage-1 baseline, 128px)
  9. diagnose    cli/diagnose_latent_range.py   (VQ latent stats)
 10. classifier  cli/classifier_experiment.py   real vs real+synthetic

Reference workflow being mirrored: train_latent_cfg.py:805-826 (stage 2 on
cached latents from a frozen stage-1 VAE), preprocess_latents_with_gmm.py:253
(GMM-stratified split), generate.py:214 (per-user folders), and
classifier_experiment_example.py:361 (the project's real acceptance metric).

Writes `<root>/e2e_demo.json` with per-stage status/duration plus the key
quality numbers (VAE PSNR/SSIM, LDM loss, classifier accuracy ±synthetic).
Stages are resumable: a stage whose artifact already exists is skipped
unless --force; --stages selects a subset.
"""

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

from _common import REPO  # noqa: E402

CLI = REPO / "cli"

# Stage dependency graph: a stage's previously-measured numbers stop
# describing the current pipeline when anything it (transitively) consumes
# re-runs. vqgan/diagnose form a side branch off the split; the classifier
# consumes the generated images, which consume the LDM, etc.
STAGE_DEPS = {
    "data": (),
    "split": ("data",),
    "kl_vae": ("split",),
    "vae_report": ("kl_vae",),
    "gmm": ("kl_vae",),
    "ldm": ("gmm",),
    "generate": ("ldm",),
    "serving": ("ldm",),
    "vqgan": ("split",),
    "diagnose": ("vqgan",),
    "classifier": ("generate",),
}

# Which stage each summary key is measured by.
SUMMARY_STAGE = {
    "vae_psnr": "vae_report",
    "vae_ssim": "vae_report",
    "vae_verdict": "vae_report",
    "generated_images": "generate",
    "serving_images": "serving",
    "classifier_acc_real": "classifier",
    "classifier_acc_real_plus_synth": "classifier",
}


def invalidated_stages(ran: set) -> set:
    """Transitive-downstream closure of the stages that re-ran this
    invocation: every stage in the returned set either re-ran or has a
    (transitive) dependency that did, so any metric it measured BEFORE this
    invocation no longer describes the current pipeline."""
    out = set(ran)
    changed = True
    while changed:
        changed = False
        for stage, deps in STAGE_DEPS.items():
            if stage not in out and any(d in out for d in deps):
                out.add(stage)
                changed = True
    return out


def collect_summary(ws: Path, report: dict, ran: set, gen_dir: Path,
                    now: str) -> None:
    """Rebuild report['summary'] + report['summary_provenance'].

    Three provenance classes per key:
      - measured: artifact read now AND its stage is not stale (re-ran this
        invocation, or nothing upstream of it changed);
      - carried: artifact absent here (cross-machine resume) but the stage
        is not stale — previous value kept, tagged ``carried: true``;
      - dropped: the stage is stale (an upstream stage re-ran without it) —
        the key is removed so the summary can never silently pair metrics
        from different model versions.
    """
    stale = invalidated_stages(ran) - ran
    prev = dict(report.get("summary") or {})
    prev_prov = dict(report.get("summary_provenance") or {})
    summary, prov = {}, {}

    def put(key, value):
        stage = SUMMARY_STAGE[key]
        summary[key] = value
        prov[key] = {
            "stage": stage,
            "measured_at": (now if stage in ran else prev_prov.get(
                key, {}).get("measured_at", "pre-existing artifact")),
        }

    vm = ws / "vae_reconstruction" / "metrics.json"
    if "vae_report" not in stale and vm.exists():
        m = json.loads(vm.read_text())
        put("vae_psnr", m.get("mean_psnr"))
        put("vae_ssim", m.get("mean_ssim"))
        put("vae_verdict", m.get("verdict"))
    if "classifier" not in stale:
        for tag, p in (("real", ws / "classifier_real.json"),
                       ("real_plus_synth", ws / "classifier_synth.json")):
            if p.exists():
                put(f"classifier_acc_{tag}",
                    json.loads(p.read_text()).get("accuracy"))
    if "generate" not in stale and gen_dir.exists():
        put("generated_images", sum(1 for _ in gen_dir.glob("ID_*/*.jpg")))
    srv = ws / "serving" / "generated"
    if "serving" not in stale and srv.exists():
        put("serving_images", sum(1 for _ in srv.glob("ID_*/*.jpg")))

    # carry forward non-stale keys whose artifact is absent on THIS machine
    for key, value in prev.items():
        stage = SUMMARY_STAGE.get(key)
        if key in summary or stage is None or stage in stale:
            continue
        summary[key] = value
        prov[key] = {**prev_prov.get(key, {"stage": stage}), "carried": True}

    report["summary"] = summary
    report["summary_provenance"] = prov


# ------------------------------------------------------------------ data --

def make_user_image(rng, size: int, user: int) -> "np.ndarray":
    """One synthetic spectrogram-like image: a per-user oriented banded
    grating (class-stable frequency + orientation) over per-image random
    Gaussian energy blobs and noise, in [0,1]."""
    import numpy as np

    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    # class-stable carrier: frequency 3..10 cycles, orientation from user id
    f = 3.0 + (user % 8)
    theta = (user * 0.37) % (np.pi / 2)
    cx, cy = np.cos(theta), np.sin(theta)
    phase = rng.rand() * 2 * np.pi
    img = np.zeros((size, size, 3), np.float32)
    grating = 0.5 + 0.5 * np.sin(2 * np.pi * f * (cx * xx + cy * yy) + phase)
    img += 0.5 * grating[..., None] * (0.4 + 0.6 * rng.rand(3))
    for _ in range(3):
        bx, by = rng.rand(2)
        s = 0.04 + 0.12 * rng.rand()
        blob = np.exp(-(((xx - bx) ** 2 + (yy - by) ** 2) / (2 * s * s)))
        img += 0.6 * blob[..., None] * rng.rand(3)
    img += 0.05 * rng.rand(size, size, 3)
    return np.clip(img / max(img.max(), 1e-6), 0, 1)


def stage_data(ws: Path, a) -> dict:
    import numpy as np
    from PIL import Image

    root = ws / "dataset"
    for u in range(1, a.num_users + 1):
        d = root / f"ID_{u}"
        d.mkdir(parents=True, exist_ok=True)
        rng = np.random.RandomState(1000 + u)
        for i in range(a.imgs_per_user):
            arr = (make_user_image(rng, a.image_size, u) * 255).astype(
                np.uint8)
            Image.fromarray(arr).save(d / f"frame_{i:03d}.jpg", quality=95)
    n = sum(1 for _ in root.glob("ID_*/*.jpg"))
    return {"images": n}


# ---------------------------------------------------------------- hygiene --

# working-tree entries that legitimately change during bench/e2e runs
# (committed measurement artifacts being refreshed) or that the round
# driver itself writes; anything else in `git status` after a run is a
# stray side effect and fails --check
ALLOWED_DIRTY = {
    "PROGRESS.jsonl",
    "results/bench_headline.json",
    "results/cpu_sampling_baseline.json",
    "results/cpu_baseline.json",
    "results/e2e/e2e_demo.json",
}
ALLOWED_UNTRACKED_PREFIXES = ("BENCH_r", "MULTICHIP_r", "COPYCHECK")


def check_clean_tree() -> int:
    """Assert bench/e2e left no stray artifacts in the repo (VERDICT r04
    weak #6: a bench run used to drop results/vqgan/vqgan.jsonl)."""
    out = subprocess.run(["git", "-C", str(REPO), "status", "--porcelain"],
                         capture_output=True, text=True)
    bad = []
    for line in out.stdout.splitlines():
        path = line[3:].strip().strip('"').rstrip("/")
        if path in ALLOWED_DIRTY:
            continue
        if any(Path(path).name.startswith(p)
               for p in ALLOWED_UNTRACKED_PREFIXES):
            continue
        bad.append(line)
    stray = REPO / "results" / "vqgan" / "vqgan.jsonl"  # gitignored offender
    if stray.exists():
        bad.append(f"?? {stray.relative_to(REPO)} (gitignored stray)")
    if bad:
        print("e2e --check FAILED: unexpected working-tree entries "
              "(bench/e2e runs must not leave stray artifacts):")
        print("\n".join(bad))
        return 1
    print("e2e --check: working tree clean (expected artifacts only)")
    return 0


# ------------------------------------------------------------- subprocess --

def run_cli(ws: Path, name: str, script: str, *args: str) -> None:
    log = ws / f"log_{name}.txt"
    cmd = [sys.executable, "-u", str(CLI / script), *args]
    with log.open("w") as fh:
        fh.write("$ " + " ".join(cmd) + "\n")
        fh.flush()
        proc = subprocess.run(cmd, stdout=fh, stderr=subprocess.STDOUT)
    if proc.returncode != 0:
        tail = "".join(log.read_text().splitlines(True)[-30:])
        raise RuntimeError(f"stage {name} failed (rc={proc.returncode}):\n"
                           f"{tail}")


# ----------------------------------------------------------------- stages --

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="./results/e2e")
    ap.add_argument("--num_users", type=int, default=31)
    ap.add_argument("--imgs_per_user", type=int, default=30)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--vae_steps", type=int, default=400)
    ap.add_argument("--vae_lr", type=float, default=1e-4)
    ap.add_argument("--vae_lr_schedule", choices=["constant", "cosine"],
                    default="cosine")
    ap.add_argument("--ldm_steps", type=int, default=600)
    ap.add_argument("--vqgan_steps", type=int, default=250)
    ap.add_argument("--gen_per_user", type=int, default=8)
    # 10, not 3: at 3 epochs the ResNet18 is still in the underfit cliff
    # (round-5 measurement: 6.7% test accuracy at 3 epochs vs 55.7% at 10
    # on the same split) and epochs cost ~5 s each after the first
    ap.add_argument("--classifier_epochs", type=int, default=10)
    ap.add_argument("--stages", nargs="*", default=None,
                    help="subset of stage names to run")
    ap.add_argument("--vae_ckpt", default=None,
                    help="use this stage-1 VAE checkpoint for every "
                         "downstream stage instead of the one the kl_vae "
                         "stage trains (e.g. a longer-budget run)")
    ap.add_argument("--force", action="store_true",
                    help="re-run stages whose artifacts already exist")
    ap.add_argument("--check", action="store_true",
                    help="run no stages; just assert the working tree is "
                         "clean of stray bench/e2e artifacts")
    a = ap.parse_args()

    if a.check:
        sys.exit(check_clean_tree())

    ws = Path(a.root).absolute()
    ws.mkdir(parents=True, exist_ok=True)
    dataset = ws / "dataset"
    split_uniform = ws / "data_split_uniform.json"
    split_gmm = ws / "data_split.json"
    vae_dir = ws / "kl_vae"
    cache = ws / "latents_cache"
    ldm_dir = ws / "ldm"
    gen_dir = ws / "generated"
    vqgan_dir = ws / "vqgan"

    vae_ckpt = (Path(a.vae_ckpt).absolute() if a.vae_ckpt
                else vae_dir / f"kl_vae-{max(1, a.vae_steps // 400)}")

    def _uniform_train_count():
        # leave a test remainder for --verify
        return max(2, min(20, a.imgs_per_user - 5))

    stages = {
        "data": dict(
            artifact=dataset / f"ID_{a.num_users}",
            run=lambda: stage_data(ws, a)),
        "split": dict(
            artifact=split_uniform,
            run=lambda: (
                run_cli(ws, "split", "create_data_split.py",
                        "--data_path", str(dataset),
                        "--output", str(split_uniform),
                        "--num_users", str(a.num_users),
                        "--images_per_user_train",
                        str(_uniform_train_count())),
                run_cli(ws, "split_verify", "create_data_split.py",
                        "--data_path", str(dataset),
                        "--output", str(split_uniform), "--verify"))),
        "kl_vae": dict(
            artifact=vae_ckpt,
            run=lambda: run_cli(
                ws, "kl_vae", "train_kl_vae.py",
                "--data_path", str(dataset), "--split", str(split_uniform),
                "--results_folder", str(vae_dir),
                "--image_size", str(a.image_size),
                "--train_steps", str(a.vae_steps),
                "--save_every", "400", "--lr", str(a.vae_lr),
                "--lr_schedule", a.vae_lr_schedule)),
        "vae_report": dict(
            artifact=ws / "vae_reconstruction" / "metrics.json",
            run=lambda: run_cli(
                ws, "vae_report", "test_vae_reconstruction.py",
                "--vae_path", str(vae_ckpt), "--data_path", str(dataset),
                "--image_size", str(a.image_size),
                "--output_dir", str(ws / "vae_reconstruction"))),
        "gmm": dict(
            artifact=split_gmm,
            run=lambda: run_cli(
                ws, "gmm", "preprocess_latents_with_gmm.py",
                "--vae_path", str(vae_ckpt), "--data_path", str(dataset),
                "--output_split", str(split_gmm),
                "--cache_folder", str(cache),
                "--num_users", str(a.num_users),
                "--image_size", str(a.image_size),
                "--n_gen_train", str(max(2, a.imgs_per_user * 2 // 5)),
                "--n_class_train", str(max(2, a.imgs_per_user // 4)))),
        "ldm": dict(
            artifact=ldm_dir / "model-1",
            run=lambda: run_cli(
                ws, "ldm", "train_latent_cfg.py",
                "--vae_path", str(vae_ckpt),
                "--data_path", str(dataset), "--split", str(split_gmm),
                "--results_folder", str(ldm_dir),
                "--latents_cache_folder", str(cache),
                "--train_num_steps", str(a.ldm_steps))),
        "generate": dict(
            artifact=gen_dir / f"ID_{a.num_users}",
            run=lambda: run_cli(
                ws, "generate", "generate.py",
                "--checkpoint", str(ldm_dir), "--vae_path", str(vae_ckpt),
                "--output_dir", str(gen_dir), "--all_users",
                "--num_images", str(a.gen_per_user),
                "--batch_size", str(a.gen_per_user))),
        "serving": dict(
            artifact=ws / "serving" / "generated" / "ID_1",
            run=lambda: (
                run_cli(ws, "serving_export", "export_serving.py",
                        "--checkpoint", str(ldm_dir),
                        "--vae_path", str(vae_ckpt),
                        "--out", str(ws / "serving" / "artifact"),
                        "--batch_size", "4", "--selftest"),
                run_cli(ws, "serving_generate", "serve_generate.py",
                        "--artifact", str(ws / "serving" / "artifact"),
                        "--output_dir", str(ws / "serving" / "generated"),
                        "--user_ids", "1", "2",
                        "--num_images", "2"))),
        "vqgan": dict(
            artifact=vqgan_dir / "vqgan-1",
            run=lambda: run_cli(
                ws, "vqgan", "train_vqgan.py",
                "--data_path", str(dataset), "--split", str(split_uniform),
                "--results_folder", str(vqgan_dir),
                "--train_steps", str(a.vqgan_steps),
                "--image_size", "128",
                "--disc_start", str(a.vqgan_steps // 2))),
        "diagnose": dict(
            artifact=ws / "log_diagnose.txt",
            run=lambda: run_cli(
                ws, "diagnose", "diagnose_latent_range.py",
                "--vqgan_path", str(vqgan_dir / "vqgan-1"),
                "--data_path", str(dataset), "--num_images", "32",
                "--image_size", "128")),
        "classifier": dict(
            artifact=ws / "classifier_synth.json",
            run=lambda: (
                run_cli(ws, "classifier_real", "classifier_experiment.py",
                        "--data_root", str(dataset),
                        "--split", str(split_gmm),
                        "--num_classes", str(a.num_users),
                        "--epochs", str(a.classifier_epochs),
                        "--image_size", str(a.image_size),
                        "--output", str(ws / "classifier_real.json")),
                run_cli(ws, "classifier_synth", "classifier_experiment.py",
                        "--data_root", str(dataset),
                        "--split", str(split_gmm),
                        "--synthetic_folder", str(gen_dir),
                        "--num_classes", str(a.num_users),
                        "--epochs", str(a.classifier_epochs),
                        "--image_size", str(a.image_size),
                        "--output", str(ws / "classifier_synth.json")))),
    }

    selected = a.stages or list(stages)
    unknown = set(selected) - set(stages)
    if unknown:
        ap.error(f"unknown stages: {sorted(unknown)}")

    report_path = ws / "e2e_demo.json"
    report = (json.loads(report_path.read_text())
              if report_path.exists() else {"stages": {}})

    ran = set()
    for name in stages:
        if name not in selected:
            continue
        spec = stages[name]
        if not a.force and Path(spec["artifact"]).exists():
            print(f"[{name}] artifact exists, skipping")
            report["stages"].setdefault(name, {"status": "cached"})
            continue
        print(f"[{name}] running...", flush=True)
        t0 = time.time()
        try:
            extra = spec["run"]()
            if not isinstance(extra, dict):
                extra = {}
        except Exception as e:
            report["stages"][name] = {"status": "FAILED", "error": str(e)}
            report_path.write_text(json.dumps(report, indent=2))
            raise
        ran.add(name)
        report["stages"][name] = {
            "status": "ok", "seconds": round(time.time() - t0, 1), **extra}
        report_path.write_text(json.dumps(report, indent=2))
        print(f"[{name}] done in {report['stages'][name]['seconds']}s")

    # ---- collect headline numbers from the stage artifacts, with
    # provenance: anything downstream of a stage that re-ran is dropped
    # unless it was itself re-measured; cross-machine carried values are
    # tagged so readers can tell measured-now from measured-before.
    if a.vae_ckpt:  # record which stage-1 checkpoint the pipeline used
        report["vae_ckpt_override"] = str(vae_ckpt)
    collect_summary(ws, report, ran, gen_dir,
                    now=time.strftime("%Y-%m-%d %H:%M:%S"))
    report_path.write_text(json.dumps(report, indent=2))
    print(json.dumps(report["summary"], indent=2))


if __name__ == "__main__":
    main()
