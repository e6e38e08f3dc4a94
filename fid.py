"""FID CLI (reference fid.py equivalent): calc and ref modes.

  python fid.py calc --images gen_dir --ref ref_stats.npz \
      --detector_path assets/pt_inception-2015-12-05.pth
  python fid.py ref --data dataset_dir --dest ref_stats.npz ...

The detector is our Flax InceptionV3 with weights converted from the
community-standard pytorch-fid state dict (same network the reference's
StyleGAN3 pickle wraps). --random_detector runs the full pipeline with
random weights (machinery smoke only; FID values are meaningless).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("MASKDIT_COMPILE_CACHE", "/tmp/jax_maskdit_cache"),
)

from maskdit_tpu.evals import fid as fid_lib
from maskdit_tpu.evals.inception import convert_inception, make_detector, random_params
from maskdit_tpu.parallel import init_distributed, mprint


def build_detector(args):
    if args.random_detector:
        mprint("WARNING: random detector weights; FID values are meaningless")
        params = random_params(jax.random.PRNGKey(0))
    else:
        if not args.detector_path or not os.path.exists(args.detector_path):
            raise SystemExit(
                "need --detector_path pointing at the pt_inception-2015-12-05 "
                "state dict (see download_assets.py / pytorch-fid)"
            )
        from maskdit_tpu.utils.port import load_torch_state_dict

        params = convert_inception(load_torch_state_dict(args.detector_path))
        params = jax.tree.map(jax.numpy.asarray, params)
    return make_detector(params)


def main() -> None:
    parser = argparse.ArgumentParser("FID calculation")
    parser.add_argument("mode", choices=["calc", "ref"])
    parser.add_argument("--images", type=str, help="generated image folder")
    parser.add_argument("--ref", type=str, help="reference stats .npz (calc)")
    parser.add_argument("--data", type=str, help="dataset folder (ref mode)")
    parser.add_argument("--dest", type=str, help="output stats path (ref mode)")
    parser.add_argument("--num", type=int, default=50000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--detector_path", type=str, default=None)
    parser.add_argument("--random_detector", action="store_true")
    args = parser.parse_args()

    init_distributed()
    detector = build_detector(args)

    if args.mode == "calc":
        assert args.images and args.ref
        value = fid_lib.calc(
            args.images, args.ref, args.num, args.seed, args.batch, detector
        )
        mprint(f"FID: {value:.4f}")
        print(value)
    else:
        assert args.data and args.dest
        fid_lib.ref(args.data, args.dest, args.batch, detector)


if __name__ == "__main__":
    main()
