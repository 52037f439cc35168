"""Time the full APE-Ti forward with the encoder stack removed (num_layers=0):
isolates the non-encoder remainder (backbone, select, decoder, heads, mask
head, glue) that attrib.py cannot chain within the remote-compile budget.

    python experiments/remainder_probe.py
"""

from __future__ import annotations

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

IMG = int(os.environ.get("BENCH_IMG", 1024))
DTYPE = jnp.dtype(os.environ.get("BENCH_DTYPE", "bfloat16"))


def main():
    from ape_tpu.modeling.build import build_ape_l_d, build_ape_ti

    model_name = os.environ.get("BENCH_MODEL", "ti")
    n_enc = int(os.environ.get("N_ENC", 0))
    n_dec = int(os.environ.get("N_DEC", 6))
    mask_on = os.environ.get("MASK_ON", "1") != "0"
    protocol = os.environ.get("PROTOCOL", "0") != "0"
    vl_on = os.environ.get("VL_ON", "1") != "0"
    kwargs = dict(
        img_size=IMG, num_queries=900, window_radius=4, dtype=DTYPE, mask_on=mask_on,
        scale_factors=(2.0, 1.0, 0.5) if protocol else (4.0, 2.0, 1.0, 0.5),
    )
    if model_name == "l_d":
        model = build_ape_l_d(use_act_checkpoint=False, drop_path_rate=0.0, **kwargs)
        nt = 1203
    else:
        model = build_ape_ti(**kwargs)
        nt = 80
    model = model.copy(
        transformer=model.transformer.copy(
            encoder=model.transformer.encoder.copy(
                num_layers=n_enc, vl_fusion=vl_on and model_name == "l_d"
            ),
            decoder=model.transformer.decoder.copy(num_layers=max(n_dec, 1)),
        )
    )
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(1, IMG, IMG, 3), jnp.float32)
    sizes = jnp.asarray([[IMG, IMG]], jnp.int32)
    text = jnp.asarray(rng.randn(1, nt, 1024), jnp.float32)
    tvalid = jnp.ones((1, nt), bool)

    from ape_tpu.utils.bench_utils import rearm_offsets, synth_params

    params = synth_params(model, (images, sizes, text, tvalid))
    if os.environ.get("BENCH_REALISTIC", "1") != "0":
        params = rearm_offsets(params)

    @jax.jit
    def fwd(params, images):
        out = model.apply({"params": params}, images, sizes, text, tvalid)
        return out["pred_logits"], out["pred_boxes"], out.get("pred_masks")

    out = fwd(params, images)
    np.asarray(out[0][..., :1])
    np.asarray((images + 0.5)[..., :1, :1])
    t0 = time.perf_counter()
    for k in range(8):
        out = fwd(params, images + float(k) * 1e-3)
    np.asarray(out[0][..., :1])
    dt = (time.perf_counter() - t0) / 8
    print(
        f"{model_name} forward enc={n_enc} dec={max(n_dec,1)} mask={int(mask_on)} "
        f"protocol={int(protocol)} vl={int(vl_on and model_name == 'l_d')}: "
        f"{dt*1e3:.1f} ms"
    )


if __name__ == "__main__":
    main()
