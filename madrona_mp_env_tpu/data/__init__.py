"""Analytics & data subsystem.

TPU-native equivalents of the reference's record/replay + event-log +
analytics pipeline (reference src/mgr.cpp:376-505, src/build_db.cpp,
src/trajectory_db.cpp, src/build_trajectory_curriculum.cpp):
play -> events -> SQLite -> filtered snapshots -> curriculum resets.

Binary formats are byte-compatible with the reference's raw struct dumps so
its downstream tooling could read our files (and vice versa).
"""

from .formats import (
    AGENT_LOG_DTYPE,
    CURRICULUM_SNAPSHOT_DTYPE,
    EventType,
    GAME_EVENT_DTYPE,
    PACKED_MATCH_STATE_DTYPE,
    PACKED_PLAYER_DTYPE,
    PACKED_STEP_SNAPSHOT_DTYPE,
    PackedPlayerStateFlags,
    STEP_LOG_DTYPE,
    TEAM_HULL_DTYPE,
    load_curriculum_snapshots,
)
from .recorder import (
    EventLogWriter,
    RecordLogWriter,
    ReplayLogReader,
    read_event_log,
    read_step_snapshots,
)
