#!/usr/bin/env python
"""Bulk latent preprocessing with per-user GMM-stratified sampling
(BASELINE config #3 — GMM/PCA run ON TPU).

Behavior target: /root/reference/preprocess_latents_with_gmm.py — per-user
VAE encode → flatten to 4096-d → StandardScaler → PCA(95% var) → GMM with
hand-tuned per-user K (USER_K_VALUES :64-72, full-cov with diag fallback) →
largest-remainder quota allocation of 30 gen_train + 20 class_train per
cluster → disjointness asserts → split JSON with cluster labels → direct
latent-cache save (:405-425).
"""

import argparse
import json
from pathlib import Path

import numpy as np

from _common import REPO, load_vae  # noqa: E402

# hand-tuned per-user cluster counts (reference :64-72); default 4 (gait
# theory), overrides below
USER_K_VALUES = {i: 4 for i in range(1, 32)}
USER_K_VALUES.update({2: 5, 7: 3, 13: 5, 19: 3, 26: 5})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vae_path", required=True)
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--output_split", default="data_split.json")
    ap.add_argument("--cache_folder", default="./latents_cache")
    ap.add_argument("--num_users", type=int, default=31)
    ap.add_argument("--n_gen_train", type=int, default=30)
    ap.add_argument("--n_class_train", type=int, default=20)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--pca_var", type=float, default=0.95)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vqgan_tpu.data import LatentCache, load_image
    from vqgan_tpu.data.datasets import pad_to_batch
    from vqgan_tpu.data.gmm import (
        gmm_fit, gmm_predict, pca_fit, standardize,
        stratified_sample_from_clusters)
    from vqgan_tpu.data.splits import IMAGE_EXTENSIONS
    from vqgan_tpu.models import KLVAE

    vae, vae_params = load_vae(args.vae_path, image_size=args.image_size)
    encode = jax.jit(lambda x: vae.apply(
        vae_params, x, method=KLVAE.encode_images_mean))

    cache = LatentCache(args.cache_folder)
    root = Path(args.data_path)
    split = {
        "metadata": {
            "method": "gmm_stratified",
            "num_users": args.num_users,
            "n_gen_train": args.n_gen_train,
            "n_class_train": args.n_class_train,
            "seed": args.seed,
        },
        "users": {},
    }

    for uid in range(1, args.num_users + 1):
        user = f"ID_{uid}"
        d = root / user
        if not d.is_dir():
            print(f"warning: missing {d}, skipping")
            continue
        files = [p for p in sorted(d.iterdir())
                 if p.suffix.lower() in IMAGE_EXTENSIONS]
        label = uid - 1

        # batch-encode all this user's images
        latents = []
        for s in range(0, len(files), args.batch_size):
            chunk = files[s : s + args.batch_size]
            imgs = np.stack(
                [load_image(p, args.image_size) for p in chunk])
            imgs = pad_to_batch(imgs, args.batch_size)
            z = np.asarray(encode(jnp.asarray(imgs)))[: len(chunk)]
            latents.append(z)
        latents = np.concatenate(latents)  # [N, h, w, c]

        # features: flatten → standardize → PCA (on TPU)
        feats = jnp.asarray(latents.reshape(len(files), -1))
        feats_std, mean, std = standardize(feats)
        comps, k_pca, _ = pca_fit(feats_std, var_ratio=args.pca_var)
        proj = jnp.dot(feats_std, comps)

        k = USER_K_VALUES.get(uid, 4)
        k = min(k, max(2, len(files) // 5))
        params, ll = gmm_fit(
            jax.random.PRNGKey(args.seed + uid), proj, k=k, n_init=10)
        labels = np.asarray(gmm_predict(params, proj))

        gen_idx, class_idx, rest_idx = stratified_sample_from_clusters(
            labels, args.n_gen_train, args.n_class_train,
            seed=args.seed + uid)

        split["users"][user] = {
            "total_images": len(files),
            "n_clusters": int(k),
            "cluster_labels": labels.tolist(),
            "gen_train_images": [files[i].name for i in gen_idx],
            "class_train_images": [files[i].name for i in class_idx],
            "train_images": [files[i].name
                             for i in np.concatenate([gen_idx, class_idx])],
            "test_images": [files[i].name for i in rest_idx],
            "test_indices": rest_idx.tolist(),
            "train_indices": np.concatenate([gen_idx, class_idx]).tolist(),
        }

        # save gen-train latents straight into the cache
        for i in gen_idx:
            cache.save(label, files[i].name, latents[i])
        print(f"{user}: {len(files)} imgs, k={k}, pca_dims={k_pca}, "
              f"gen={len(gen_idx)} class={len(class_idx)} test={len(rest_idx)}")

    Path(args.output_split).write_text(json.dumps(split, indent=2))
    print(f"wrote {args.output_split}")


if __name__ == "__main__":
    main()
