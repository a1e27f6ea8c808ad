from .check_version import check_version
from .compile_cache import enable_compilation_cache
from .device import get_device_usage, set_device
from .json_utils import beautify_json
from .seed import seed_everything

__all__ = [
    "check_version",
    "get_device_usage",
    "set_device",
    "beautify_json",
    "seed_everything",
]
