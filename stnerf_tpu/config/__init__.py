from .node import CfgNode
from .defaults import get_cfg

# Compatibility alias mirroring the reference's ``from config import cfg``
# global (ref: config/__init__.py:7). Prefer ``get_cfg()`` which returns a
# fresh copy instead of sharing one mutable singleton.
cfg = get_cfg()

__all__ = ["CfgNode", "get_cfg", "cfg"]
