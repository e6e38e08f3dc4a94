from maskdit_tpu.evals import fid
from maskdit_tpu.evals.evaluator import (
    Evaluator,
    frechet_distance,
    inception_score,
    precision_recall,
)
from maskdit_tpu.evals.inception import (
    InceptionV3,
    convert_inception,
    make_detector,
    random_params,
)

__all__ = [
    "fid", "Evaluator", "frechet_distance", "inception_score",
    "precision_recall", "InceptionV3", "convert_inception", "make_detector",
    "random_params",
]
