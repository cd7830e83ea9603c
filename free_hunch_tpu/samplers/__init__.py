from free_hunch_tpu.samplers.edm import (  # noqa: F401
    conditional_sampler, get_sigma_steps, prepare_schedule, sample_scan,
)
