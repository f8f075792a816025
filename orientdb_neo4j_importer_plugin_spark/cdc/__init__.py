from .apply import ApplyResult, apply_changes
from .merge import delete_where, merge_into, restore_as_of, update_where
from .lww import lww_resolve, lww_resolve_salted, lww_resolve_window
from .replay import replay_quarantine
from .scd import Scd2View, scd2_history

__all__ = [
    "ApplyResult",
    "apply_changes",
    "delete_where",
    "lww_resolve",
    "merge_into",
    "lww_resolve_salted",
    "lww_resolve_window",
    "replay_quarantine",
    "restore_as_of",
    "Scd2View",
    "scd2_history",
    "update_where",
]
