from .seed import seed_everything
from .json_utils import beautify_json

__all__ = ["seed_everything", "beautify_json"]
