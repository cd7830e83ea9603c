from free_hunch_tpu.data.dataset import ImageFolderDataset  # noqa: F401
from free_hunch_tpu.data.encoders import StandardRGBEncoder  # noqa: F401
