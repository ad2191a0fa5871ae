#!/usr/bin/env python
"""Per-user cluster-count validation sweep.

Behavior target: /root/reference/validate_cluster_number.py — for each user,
sweep k ∈ [k_min, k_max] computing GMM BIC/AIC + silhouette + Davies-Bouldin
+ Calinski-Harabasz (:97-139), knee detection (:142-162), cluster-size
distribution (:251-266), and a majority-vote recommendation vs the
gait-theory prior k=4 (:316-359). Plots are optional (matplotlib may be
absent); JSON report always written.
"""

import argparse
import json
from pathlib import Path

import numpy as np

from _common import REPO, load_vae  # noqa: E402


def find_elbow_point(values):
    """Knee of a decreasing curve by max distance to the chord
    (reference :142-162)."""
    v = np.asarray(values, np.float64)
    n = len(v)
    if n < 3:
        return 0
    x = np.arange(n)
    # line from first to last point
    p1 = np.array([0, v[0]])
    p2 = np.array([n - 1, v[-1]])
    d = np.abs(np.cross(p2 - p1, np.stack([x, v], 1) - p1)) / \
        np.linalg.norm(p2 - p1)
    return int(np.argmax(d))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vae_path", required=True)
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--output_dir", default="./cluster_validation")
    ap.add_argument("--num_users", type=int, default=31)
    ap.add_argument("--k_min", type=int, default=2)
    ap.add_argument("--k_max", type=int, default=8)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vqgan_tpu.data import load_image
    from vqgan_tpu.data.datasets import pad_to_batch
    from vqgan_tpu.data.gmm import (
        calinski_harabasz_score, davies_bouldin_score, gmm_aic, gmm_bic,
        gmm_fit, gmm_predict, pca_fit, silhouette_score, standardize)
    from vqgan_tpu.data.splits import IMAGE_EXTENSIONS
    from vqgan_tpu.models import KLVAE

    vae, vae_params = load_vae(args.vae_path, image_size=args.image_size)
    encode = jax.jit(lambda x: vae.apply(
        vae_params, x, method=KLVAE.encode_images_mean))

    root = Path(args.data_path)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    report = {}
    votes = []

    for uid in range(1, args.num_users + 1):
        d = root / f"ID_{uid}"
        if not d.is_dir():
            continue
        files = [p for p in sorted(d.iterdir())
                 if p.suffix.lower() in IMAGE_EXTENSIONS]
        latents = []
        for s in range(0, len(files), args.batch_size):
            chunk = files[s : s + args.batch_size]
            imgs = np.stack([load_image(p, args.image_size) for p in chunk])
            imgs = pad_to_batch(imgs, args.batch_size)
            latents.append(np.asarray(encode(jnp.asarray(imgs)))[: len(chunk)])
        feats = jnp.asarray(np.concatenate(latents).reshape(len(files), -1))
        feats_std, _, _ = standardize(feats)
        comps, _, _ = pca_fit(feats_std, var_ratio=0.95)
        proj = jnp.dot(feats_std, comps)
        proj_np = np.asarray(proj)

        ks = list(range(args.k_min, args.k_max + 1))
        metrics = {m: [] for m in ("bic", "aic", "silhouette",
                                   "davies_bouldin", "calinski_harabasz")}
        sizes = {}
        for k in ks:
            params, ll = gmm_fit(
                jax.random.PRNGKey(args.seed + uid * 100 + k), proj, k=k,
                n_init=5)
            labels = np.asarray(gmm_predict(params, proj))
            metrics["bic"].append(gmm_bic(params, proj_np, float(ll)))
            metrics["aic"].append(gmm_aic(params, proj_np, float(ll)))
            metrics["silhouette"].append(silhouette_score(proj_np, labels))
            metrics["davies_bouldin"].append(
                davies_bouldin_score(proj_np, labels))
            metrics["calinski_harabasz"].append(
                calinski_harabasz_score(proj_np, labels))
            sizes[k] = np.bincount(labels, minlength=k).tolist()

        recommendations = {
            "bic_elbow": ks[find_elbow_point(metrics["bic"])],
            "aic_elbow": ks[find_elbow_point(metrics["aic"])],
            "silhouette_best": ks[int(np.argmax(metrics["silhouette"]))],
            "davies_bouldin_best": ks[int(np.argmin(
                metrics["davies_bouldin"]))],
            "calinski_best": ks[int(np.argmax(
                metrics["calinski_harabasz"]))],
        }
        vals, counts = np.unique(
            list(recommendations.values()), return_counts=True)
        majority = int(vals[np.argmax(counts)])
        votes.append(majority)
        report[f"ID_{uid}"] = {
            "ks": ks, "metrics": metrics, "cluster_sizes": sizes,
            "recommendations": recommendations, "majority_vote": majority,
        }
        print(f"ID_{uid}: majority k={majority} "
              f"(votes: {recommendations})")

        from vqgan_tpu.eval.plots import plot_cluster_validation

        plot_cluster_validation(
            f"ID_{uid}", ks, metrics, sizes, recommendations,
            out / f"ID_{uid}_validation.png")

    overall = int(np.bincount(votes).argmax()) if votes else None
    report["summary"] = {
        "overall_majority_k": overall,
        "gait_theory_k": 4,
        "agreement_with_theory": overall == 4,
    }
    (out / "cluster_validation.json").write_text(json.dumps(report, indent=2))
    print(f"overall majority k={overall} (gait theory suggests 4); "
          f"report → {out / 'cluster_validation.json'}")


if __name__ == "__main__":
    main()
