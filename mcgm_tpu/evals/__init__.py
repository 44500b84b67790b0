from .metrics import Metric, inception_score, fid_from_features, frechet_distance, dbi  # noqa: F401
