#!/usr/bin/env python
"""Bulk latent preprocessing with stratified UNIFORM sampling.

Behavior target: /root/reference/preprocess_latents.py — per-user linspace
frame selection (:126-146), data_split.json writing (:156-193), batched VAE
encoding of train+test into the latent cache (:196-238).
"""

import argparse
from pathlib import Path

import numpy as np

from _common import REPO, load_vae  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vae_path", required=True)
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--output_split", default="data_split.json")
    ap.add_argument("--cache_folder", default="./latents_cache")
    ap.add_argument("--num_users", type=int, default=31)
    ap.add_argument("--images_per_user_train", type=int, default=50)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=56)
    ap.add_argument("--encode_test", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="also encode test images (--no-encode_test to skip)")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vqgan_tpu.data import (LatentCache, create_data_split, load_image,
                                save_split, verify_split)
    from vqgan_tpu.data.datasets import pad_to_batch
    from vqgan_tpu.models import KLVAE

    vae, vae_params = load_vae(args.vae_path, image_size=args.image_size)
    encode = jax.jit(lambda x: vae.apply(
        vae_params, x, method=KLVAE.encode_images_mean))

    split = create_data_split(
        args.data_path, args.num_users, args.images_per_user_train, args.seed)
    assert not verify_split(split)
    save_split(split, args.output_split)
    print(f"wrote {args.output_split}")

    cache = LatentCache(args.cache_folder)
    root = Path(args.data_path)

    todo = []  # (user, name, label)
    for user, info in split["users"].items():
        label = int(user.split("_")[1]) - 1
        names = info["train_images"] + (
            info["test_images"] if args.encode_test else [])
        for name in names:
            if not cache.has(label, name):
                todo.append((user, name, label))

    print(f"encoding {len(todo)} images (batch {args.batch_size})")
    for s in range(0, len(todo), args.batch_size):
        chunk = todo[s : s + args.batch_size]
        imgs = np.stack([
            load_image(root / u / n, args.image_size) for u, n, _ in chunk])
        imgs = pad_to_batch(imgs, args.batch_size)
        latents = np.asarray(encode(jnp.asarray(imgs)))
        for (u, n, label), z in zip(chunk, latents):
            cache.save(label, n, z)
        done = min(s + args.batch_size, len(todo))
        print(f"  {done}/{len(todo)}", end="\r")
    print(f"\ncache populated at {args.cache_folder}")


if __name__ == "__main__":
    main()
