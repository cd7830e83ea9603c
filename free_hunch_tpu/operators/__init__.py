from free_hunch_tpu.operators.linear import (  # noqa: F401
    get_operator, register_operator, LinearOperator,
)
from free_hunch_tpu.operators.noise import get_noise, register_noise  # noqa: F401
