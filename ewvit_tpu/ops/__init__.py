"""TPU compute primitives: Haar wavelet filter bank, attention, preprocessing."""

from ewvit_tpu.ops.haar import haar_dwt2d, haar_idwt2d, haar_dwt2d_pallas  # noqa: F401
from ewvit_tpu.ops.preprocess import color_jitter, normalize, preprocess_batch  # noqa: F401
