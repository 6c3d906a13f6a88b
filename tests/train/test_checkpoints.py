import numpy as np
import pytest

from manuscript_tpu.train.checkpoints import OrbaxCheckpointer


@pytest.fixture
def state():
    return {
        "params": {"w": np.arange(6.0).reshape(2, 3), "b": np.zeros(3)},
        "step": np.asarray(7),
    }


class TestOrbaxCheckpointer:
    def test_save_restore_roundtrip(self, tmp_path, state):
        ck = OrbaxCheckpointer(tmp_path / "ckpts")
        ck.save(1, state, wait=True)
        template = {
            "params": {"w": np.zeros((2, 3)), "b": np.zeros(3)},
            "step": np.asarray(0),
        }
        restored = ck.restore(template)
        np.testing.assert_array_equal(restored["params"]["w"], state["params"]["w"])
        assert int(restored["step"]) == 7
        ck.close()

    def test_latest_and_retention(self, tmp_path, state):
        ck = OrbaxCheckpointer(tmp_path / "ckpts", max_to_keep=2)
        for s in (1, 2, 3):
            ck.save(s, state, wait=True)
        assert ck.latest_step() == 3
        assert set(ck.all_steps()) == {2, 3}  # 1 evicted
        ck.close()

    def test_restore_specific_step(self, tmp_path, state):
        ck = OrbaxCheckpointer(tmp_path / "ckpts")
        ck.save(5, state, wait=True)
        state2 = dict(state, step=np.asarray(11))
        ck.save(6, state2, wait=True)
        template = dict(state, step=np.asarray(0))
        old = ck.restore(template, step=5)
        assert int(old["step"]) == 7
        ck.close()

    def test_empty_raises(self, tmp_path, state):
        ck = OrbaxCheckpointer(tmp_path / "empty")
        with pytest.raises(FileNotFoundError):
            ck.restore(state)
        ck.close()
