"""ADM evaluation-suite CLI (reference evaluator.py:626-695 equivalent).

  python evaluator.py ref_batch.npz sample_batch.npz \
      --detector_path assets/pt_inception-2015-12-05.pth

Prints Inception Score, FID, sFID, Precision and Recall — the same five
lines as the reference's TF1 tool (evaluator.py:103-108) — from our Flax
InceptionV3 features.

Inputs:
  * ``sample_batch``: npz with images under ``arr_0`` (NHWC uint8), or a
    directory of PNGs (the reference converts dirs via an all-in-RAM
    png2npz, evaluator.py:92-94; here both paths stream).
  * ``ref_batch``: same, or an npz carrying precomputed ``mu/sigma`` (+
    optional ``mu_s/sigma_s``) statistics (reference read_statistics,
    evaluator.py:211-217). Precision/recall need raw reference images;
    they are skipped with a warning when only stats are available.

Memory is bounded by the minibatch size: images stream from the zip/dir,
only the (N x d) float32 feature matrices are held — a 50K-image run fits
in a few GB of host RAM instead of the ~10 GB the image tensor alone
would need.
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

import numpy as np

from maskdit_tpu.evals import evaluator as ev
from maskdit_tpu.evals.inception import convert_inception, make_detector, random_params
from maskdit_tpu.utils.port import load_torch_state_dict


def build_detector(args):
    if args.random_detector:
        print("WARNING: random detector weights; metric values are meaningless")
        params = random_params(jax.random.PRNGKey(0))
    else:
        if not args.detector_path or not os.path.exists(args.detector_path):
            raise SystemExit(
                "need --detector_path pointing at the pt_inception-2015-12-05 "
                "state dict (see download_assets.py), or --random_detector "
                "for a machinery-only smoke run"
            )
        params = convert_inception(load_torch_state_dict(args.detector_path))
    import jax.numpy as jnp

    params = jax.tree.map(jnp.asarray, params)
    return make_detector(params)


def batches_for(path: str, batch_size: int):
    if os.path.isdir(path):
        return ev.stream_folder_batches(path, batch_size)
    return ev.stream_npz_batches(path, batch_size)


def main() -> None:
    parser = argparse.ArgumentParser("ADM evaluation suite")
    parser.add_argument("ref_batch", help="reference npz (images and/or mu/sigma) or PNG dir")
    parser.add_argument("sample_batch", help="sample npz or PNG dir")
    parser.add_argument("--detector_path", type=str, default=None)
    parser.add_argument("--random_detector", action="store_true")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--save_ref_stats", type=str, default=None,
                        help="write the reference batch's mu/sigma/mu_s/"
                        "sigma_s to this npz (ADM read_statistics format) "
                        "so future runs skip the reference pass")
    args = parser.parse_args()

    detector = build_detector(args)
    evaluator = ev.Evaluator(detector, batch=args.batch_size)

    print("computing sample batch activations...")
    sample = evaluator.features_from_batches(
        batches_for(args.sample_batch, args.batch_size)
    )

    ref_is_npz = not os.path.isdir(args.ref_batch)
    ref_has_images = (not ref_is_npz) or ev.npz_has_key(args.ref_batch, "arr_0")
    ref_has_stats = ref_is_npz and ev.npz_has_key(args.ref_batch, "mu")

    ref = None
    if ref_has_images:
        print("computing reference batch activations...")
        ref = evaluator.features_from_batches(
            batches_for(args.ref_batch, args.batch_size)
        )

    print("computing/reading reference batch statistics...")
    if ref_has_stats:
        with np.load(args.ref_batch) as obj:
            ref_stats = (obj["mu"], obj["sigma"])
            ref_stats_spatial = (
                (obj["mu_s"], obj["sigma_s"]) if "mu_s" in obj else None
            )
    else:
        if ref is None:
            raise SystemExit(
                f"reference batch {args.ref_batch!r} has neither images "
                "(arr_0) nor precomputed statistics (mu/sigma)"
            )
        ref_stats = ev.feature_stats(ref["pool"])
        ref_stats_spatial = ev.feature_stats(ref["spatial"])
        if args.save_ref_stats:
            np.savez(
                args.save_ref_stats,
                mu=ref_stats[0], sigma=ref_stats[1],
                mu_s=ref_stats_spatial[0], sigma_s=ref_stats_spatial[1],
            )
            print(f"saved reference statistics to {args.save_ref_stats}")

    print("Computing evaluations...")
    print("Inception Score:", ev.inception_score(sample["logits"]))
    print("FID:", ev.frechet_distance_from_stats(
        ev.feature_stats(sample["pool"]), ref_stats))
    if ref_stats_spatial is not None:
        print("sFID:", ev.frechet_distance_from_stats(
            ev.feature_stats(sample["spatial"]), ref_stats_spatial))
    else:
        print("sFID: n/a (reference npz lacks mu_s/sigma_s)")
    if ref is not None:
        prec, recall = ev.precision_recall(ref["pool"], sample["pool"])
        print("Precision:", prec)
        print("Recall:", recall)
    else:
        print("Precision: n/a (reference batch has no raw images)")
        print("Recall: n/a (reference batch has no raw images)")


if __name__ == "__main__":
    main()
