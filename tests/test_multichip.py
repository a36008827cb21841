"""Sharded training-step tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np


def test_dryrun_multichip_8dev():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_optimizer_routing():
    """Param-name routing must mirror train.py:389-407."""
    import jax.numpy as jnp

    from bridgeqa_tpu.train.optim import label_params

    params = {
        "blip_model": {
            "text_encoder": {"encoder": {"layer_twin_0": {"w": jnp.zeros(1)},
                                         "layer_0": {"w": jnp.zeros(1)}}},
            "text_decoder_scene": {"w": jnp.zeros(1)},
            "lowrank_2d": {"w": jnp.zeros(1)},
            "answer_cls": {"w": jnp.zeros(1)},
            "visual_encoder": {"w": jnp.zeros(1)},
        },
        "detector": {"w": jnp.zeros(1)},
    }
    labels = label_params(params)
    assert labels["blip_model"]["text_encoder"]["encoder"]["layer_twin_0"]["w"] == "blip3d"
    assert labels["blip_model"]["text_encoder"]["encoder"]["layer_0"]["w"] == "blip"
    assert labels["blip_model"]["text_decoder_scene"]["w"] == "blip3d"
    assert labels["blip_model"]["lowrank_2d"]["w"] == "other"
    assert labels["blip_model"]["answer_cls"]["w"] == "other"
    assert labels["blip_model"]["visual_encoder"]["w"] == "blip"
    assert labels["detector"]["w"] == "other"


def test_multistep_schedule():
    from bridgeqa_tpu.train.optim import multistep_schedule

    sched = multistep_schedule(1.0, [2, 4], 0.1, steps_per_epoch=10)
    assert np.isclose(sched(0), 1.0)
    assert np.isclose(sched(19), 1.0)
    assert np.isclose(sched(20), 0.1)
    assert np.isclose(sched(40), 0.01)
