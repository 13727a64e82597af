"""Golden-trajectory regression: the committed fixed-seed rollout must be
reproduced bit-exactly by the dense CPU path (reference role: record/replay
as the regression mechanism, src/sim.cpp:4750-4843). The TPU-side tolerance
check runs via `python -m madrona_mp_env_tpu.tools.golden --check` on the
chip (see BASELINE.md for measured kernel divergence)."""

from madrona_mp_env_tpu.tools.golden import DEFAULT_PATH, check


def test_golden_trajectory_bit_exact_cpu():
    metrics = check(DEFAULT_PATH, pos_atol=0.0, verbose=False)
    assert metrics["first_divergence_step"] == 100
    assert metrics["max_hp_err_horizon"] == 0.0
    assert metrics["max_reward_err_horizon"] == 0.0


def test_golden_generate_refuses_non_cpu_backend(monkeypatch, tmp_path):
    """The determinism contract's ratchet (VERDICT r4 item 10): regenerating
    the golden on anything but the CPU backend must fail loudly."""
    import jax
    import pytest

    from madrona_mp_env_tpu.tools import golden

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pytest.raises(RuntimeError, match="CPU backend"):
        golden.generate(str(tmp_path / "g.npz"))
