"""Dynamic construction + cached IO utilities.

Parity: reference ``dnnlib/util.py`` — ``construct_class_by_name:288`` (the
datasets are built from dotted class names in the config,
``generate_conditional.py:321``) and ``open_url:386`` (cached http/file
opener; this environment has no egress, so http URLs require a pre-populated
cache and local paths/file:// work as usual).
"""
from __future__ import annotations

import hashlib
import importlib
import os
import re
from typing import Any, Optional, Tuple


def get_module_from_obj_name(obj_name: str) -> Tuple[Any, str]:
    """Split 'pkg.mod.Class' into (imported module, 'Class')."""
    parts = obj_name.split(".")
    for i in range(len(parts) - 1, 0, -1):
        try:
            module = importlib.import_module(".".join(parts[:i]))
            return module, ".".join(parts[i:])
        except ImportError:
            continue
    raise ImportError(f"cannot import any module prefix of {obj_name!r}")


def get_obj_by_name(name: str) -> Any:
    module, local = get_module_from_obj_name(name)
    obj = module
    for part in local.split("."):
        obj = getattr(obj, part)
    return obj


def call_func_by_name(*args, func_name: str, **kwargs) -> Any:
    return get_obj_by_name(func_name)(*args, **kwargs)


def construct_class_by_name(*args, class_name: str, **kwargs) -> Any:
    """Instantiate a class from its dotted name (reference :288-291)."""
    return get_obj_by_name(class_name)(*args, **kwargs)


def is_url(obj: Any) -> bool:
    return isinstance(obj, str) and re.match(r"^[a-z]+://", obj) is not None


def open_url(url: str, cache_dir: Optional[str] = None, verbose: bool = True,
             return_filename: bool = False):
    """Open a local path, file:// URL, or cached http(s) URL (reference
    :386-485). http(s) URLs resolve ONLY from the local cache in this
    zero-egress environment."""
    if not is_url(url):
        if return_filename:
            return url
        return open(url, "rb")
    if url.startswith("file://"):
        path = url[len("file://"):]
        return path if return_filename else open(path, "rb")

    cache_dir = cache_dir or os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "free_hunch_tpu")
    url_md5 = hashlib.md5(url.encode("utf-8")).hexdigest()
    if os.path.isdir(cache_dir):
        import glob
        hits = glob.glob(os.path.join(cache_dir, f"{url_md5}_*"))
        if hits:
            return hits[0] if return_filename else open(hits[0], "rb")
    raise IOError(
        f"cannot fetch {url!r}: no network egress and no cache entry under "
        f"{cache_dir} (expected a file named {url_md5}_<name>)")
