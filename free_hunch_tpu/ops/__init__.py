from free_hunch_tpu.ops.dct import dct_2d, idct_2d, dct_matrix  # noqa: F401
from free_hunch_tpu.ops.fftops import (  # noqa: F401
    p2o, pre_calculate, upsample, downsample, splits,
)
from free_hunch_tpu.ops.cg import cg_batch, cg_solve  # noqa: F401
