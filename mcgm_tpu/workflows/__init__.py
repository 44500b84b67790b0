from .sampling import Sampler, load_sampler  # noqa: F401
from .generate import generate  # noqa: F401
from .transit import transit_workflow  # noqa: F401
from .create import create_workflow  # noqa: F401
