from .checkpoint import save_checkpoint, load_checkpoint, resume  # noqa: F401
from .images import save_image_grid, to_uint8  # noqa: F401
