#!/usr/bin/env python
"""Create / verify the stratified uniform data split.

Behavior target: /root/reference/vqgan_ldm_baseline/create_data_split.py —
`--verify` runs the integrity checks (:130-182).
"""

import argparse

from _common import REPO  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--output", default="data_split.json")
    ap.add_argument("--num_users", type=int, default=31)
    ap.add_argument("--images_per_user_train", type=int, default=50)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--verify", action="store_true",
                    help="verify an existing split instead of creating one")
    args = ap.parse_args()

    from vqgan_tpu.data import (create_data_split, load_split, save_split,
                                verify_split)

    if args.verify:
        split = load_split(args.output)
        problems = verify_split(split)
        if problems:
            print("PROBLEMS FOUND:")
            for p in problems:
                print(f"  - {p}")
            raise SystemExit(1)
        n_train = sum(len(u["train_images"]) for u in split["users"].values())
        n_test = sum(len(u["test_images"]) for u in split["users"].values())
        print(f"split OK: {len(split['users'])} users, "
              f"{n_train} train / {n_test} test images, no overlaps")
        return

    split = create_data_split(
        args.data_path, args.num_users, args.images_per_user_train, args.seed)
    problems = verify_split(split)
    assert not problems, problems
    save_split(split, args.output)
    print(f"wrote {args.output} ({len(split['users'])} users)")


if __name__ == "__main__":
    main()
