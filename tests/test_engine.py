"""Engine tests: optimizer multipliers/schedule, train step accumulation,
checkpoint save/restore round trip, events."""

import numpy as np
import optax

import jax
import jax.numpy as jnp

from ape_tpu.engine.optimizer import (
    build_optimizer,
    lr_multiplier_tree,
    multistep_schedule,
    vit_layer_id,
)
from ape_tpu.engine.train_step import TrainState, create_train_state
from ape_tpu.utils.events import EventStorage, HistoryBuffer


def test_vit_layer_id():
    assert vit_layer_id("backbone/net/pos_embed", 12) == 0
    assert vit_layer_id("backbone/net/patch_embed/kernel", 12) == 0
    assert vit_layer_id("backbone/net/blocks_3/attn/qkv/kernel", 12) == 4
    assert vit_layer_id("transformer/encoder/layers_0/ffn/fc1/kernel", 12) == 13


def test_lr_multiplier_tree():
    params = {
        "backbone": {"net": {"blocks_0": {"w": jnp.zeros(3)}, "pos_embed": jnp.zeros(3)}},
        "transformer": {
            "encoder": {"layers_0": {"attn": {"sampling_offsets": {"kernel": jnp.zeros(3)}}}},
            "head": {"kernel": jnp.zeros(3)},
        },
    }
    m = lr_multiplier_tree(params, num_layers=2, decay=0.5)
    assert m["backbone"]["net"]["pos_embed"] == 0.5**3
    assert m["backbone"]["net"]["blocks_0"]["w"] == 0.5**2
    assert m["transformer"]["head"]["kernel"] == 1.0
    assert (
        m["transformer"]["encoder"]["layers_0"]["attn"]["sampling_offsets"]["kernel"]
        == 0.1
    )


def test_multistep_schedule():
    s = multistep_schedule(1.0, [10, 20], gamma=0.1)
    assert float(s(5)) == 1.0
    assert abs(float(s(15)) - 0.1) < 1e-6
    assert abs(float(s(25)) - 0.01) < 1e-6


def test_build_optimizer_step():
    params = {"backbone": {"net": {"blocks_0": {"kernel": jnp.ones((4, 4))}}},
              "head": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)}}
    tx = build_optimizer(params, base_lr=0.1, vit_num_layers=1, milestones=[])
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # head lr multiplier 1.0, backbone block decayed -> smaller update magnitude
    up_head = float(jnp.abs(updates["head"]["kernel"]).mean())
    up_bb = float(jnp.abs(updates["backbone"]["net"]["blocks_0"]["kernel"]).mean())
    assert up_bb < up_head


def test_checkpoint_roundtrip(tmp_path):
    from ape_tpu.checkpoint.checkpointer import Checkpointer

    params = {"w": jnp.asarray(np.arange(6, dtype=np.float32).reshape(2, 3))}
    tx = optax.sgd(0.1)
    state = create_train_state(params, tx)
    ck = Checkpointer(str(tmp_path / "ck"), keep=2)
    ck.save(5, state)
    assert ck.latest_step() == 5
    template = create_train_state({"w": jnp.zeros((2, 3))}, tx)
    restored = ck.load(template)
    np.testing.assert_allclose(np.asarray(restored.params["w"]), np.asarray(params["w"]))
    # resume_or_load prefers the checkpoint
    restored2, start = ck.resume_or_load(template, resume=True)
    assert start == 5


def test_event_storage():
    st = EventStorage()
    for v in (1.0, 2.0, 3.0):
        st.put_scalar("loss", v)
    assert st.histories()["loss"].median() == 2.0
    assert st.latest()["loss"] == 3.0
