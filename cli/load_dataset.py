#!/usr/bin/env python
"""Split loading smoke test + summary printers.

Behavior target: /root/reference/load_dataset.py:93-187 — `--test_load`
loads one batch from each split and prints shapes; the summary printers show
per-user counts.
"""

import argparse

from _common import REPO  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--split", required=True)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--test_load", action="store_true")
    args = ap.parse_args()

    from vqgan_tpu.data import BatchLoader, ImageFolderDataset, load_split

    split = load_split(args.split)

    print(f"split: {len(split['users'])} users "
          f"(method: {split.get('metadata', {}).get('method', '?')})")
    total_train = total_test = 0
    for user, info in sorted(split["users"].items(),
                             key=lambda kv: int(kv[0].split("_")[1])):
        n_train = len(info.get("train_images", []))
        n_test = len(info.get("test_images", []))
        extra = ""
        if "gen_train_images" in info:
            extra = (f" (gen {len(info['gen_train_images'])}, class "
                     f"{len(info.get('class_train_images', []))})")
        print(f"  {user}: train {n_train}, test {n_test}{extra}")
        total_train += n_train
        total_test += n_test
    print(f"total: {total_train} train / {total_test} test")

    if args.test_load:
        for subset in ("train", "test"):
            ds = ImageFolderDataset(args.data_root, split, subset,
                                    image_size=args.image_size,
                                    imagenet_norm=True)
            loader = BatchLoader(ds, batch_size=min(4, len(ds)),
                                 shuffle=False, drop_last=False)
            images, labels = next(iter(loader))
            print(f"{subset}: batch images {images.shape} "
                  f"dtype={images.dtype}, labels {labels[:4].tolist()}")
        print("smoke load OK")


if __name__ == "__main__":
    main()
