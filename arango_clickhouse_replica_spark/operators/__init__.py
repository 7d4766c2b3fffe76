from .cdc import (
    REMOVE_DOCUMENT,
    UPSERT_DOCUMENT,
    latest_state,
    latest_alive,
    merge_upsert,
    preprocess_envelopes,
)

__all__ = [
    "REMOVE_DOCUMENT",
    "UPSERT_DOCUMENT",
    "latest_state",
    "latest_alive",
    "merge_upsert",
    "preprocess_envelopes",
]
