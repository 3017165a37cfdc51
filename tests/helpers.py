import numpy as np


def rel_vec_err(a, b):
    """Per-particle relative error of vector quantities: |a-b| / |b|."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    num = np.linalg.norm(a - b, axis=-1)
    den = np.linalg.norm(b, axis=-1)
    den = np.where(den > 0, den, 1.0)
    return num / den


def rms(x):
    return float(np.sqrt(np.mean(np.square(x))))
