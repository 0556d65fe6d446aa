from . import (  # noqa: F401
    alignment,
    ann,
    asof,
    audio,
    dedup,
    intervals,
    multimodal,
    sessionize,
    upsert,
)

__all__ = [
    "alignment",
    "ann",
    "asof",
    "audio",
    "dedup",
    "intervals",
    "multimodal",
    "sessionize",
    "upsert",
]
