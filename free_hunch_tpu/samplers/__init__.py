from free_hunch_tpu.samplers.edm import conditional_sampler, get_sigma_steps  # noqa: F401
