"""Pretty JSON printing (parity: rec_pangu/utils/json_utils.py:11-21)."""
import json
from typing import Any


def beautify_json(data: Any, indent: int = 4) -> str:
    return json.dumps(data, indent=indent, ensure_ascii=False, default=str)
