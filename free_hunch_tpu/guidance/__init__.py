from free_hunch_tpu.guidance.mechanisms import (  # noqa: F401
    choose_conditioning_mechanism, FreeHunch, DPS, PiGDM, TMPD,
    PengConvert, PengAnalytic, DiffPIR, PiGDMVideodiffSchedule,
)
