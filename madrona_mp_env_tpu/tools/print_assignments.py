"""Preview the PBT world -> (team policy, team policy) assignment table.

Equivalent of the reference's scripts/print_assignments.py.

Usage: python -m madrona_mp_env_tpu.tools.print_assignments \\
    <num_worlds> <num_policies>
"""

from __future__ import annotations

import sys
from itertools import product


def print_assignments(num_worlds: int, num_policies: int) -> None:
    num_world_digits = len(str(num_worlds))
    assignments = list(product(range(num_policies), repeat=2))
    num_repeats = num_worlds // len(assignments)

    cur_world_idx = 0
    for assignment in assignments:
        for _ in range(num_repeats):
            print(f"{cur_world_idx:{num_world_digits}}: {assignment}")
            cur_world_idx += 1


if __name__ == "__main__":
    print_assignments(int(sys.argv[1]), int(sys.argv[2]))
