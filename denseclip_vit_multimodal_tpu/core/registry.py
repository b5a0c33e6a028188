"""Component registries: extensibility point for custom modules.

The reference carries a minimal decorator `Registry` that its own builder
then bypasses (reference: segmentation/denseclip/models.py:48-67 defines
BACKBONES; denseclip.py:114-125 dispatches on type strings instead).  Here
the registries are actually consulted: `build_denseclip` falls back to them
for any `type:` string it doesn't know natively, so downstream users can
plug in custom backbones / necks / heads / text encoders without patching
the builder:

    from denseclip_vit_multimodal_tpu.core.registry import BACKBONES

    @BACKBONES.register("MyBackbone")
    class MyBackbone(nn.Module):
        out_channels: int = 256        # builder introspects this
        ...
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._entries: Dict[str, Any] = {}

    def register(self, key: Optional[str] = None) -> Callable:
        def decorator(obj):
            name = key or obj.__name__
            if name in self._entries:
                raise KeyError(f"{name!r} already registered in {self.name}")
            self._entries[name] = obj
            return obj

        return decorator

    def get(self, key: str):
        return self._entries.get(key)

    def __contains__(self, key: str) -> bool:
        return key in self._entries

    def keys(self):
        return self._entries.keys()


BACKBONES = Registry("backbones")
TEXT_ENCODERS = Registry("text_encoders")
NECKS = Registry("necks")
HEADS = Registry("heads")
