"""Config preset contracts (round 5): UHD_CONFIG is FULL_CONFIG at 4K with
fractional-res compositing and nothing else changed."""

import dataclasses

from volumetricrenderer_tpu import DEMO_CONFIG, FULL_CONFIG, UHD_CONFIG


def test_uhd_config_is_full_config_at_4k():
    assert UHD_CONFIG.image_width == 3840
    assert UHD_CONFIG.image_height == 2160
    assert UHD_CONFIG.composite_upsample == 2
    for f in dataclasses.fields(UHD_CONFIG):
        if f.name in ("image_width", "image_height", "composite_upsample"):
            continue
        assert getattr(UHD_CONFIG, f.name) == getattr(FULL_CONFIG, f.name), \
            f.name


def test_production_defaults_documented_decisions():
    # the ss=4 radiance bake IS the intended production default (config.py
    # release note; the exact path stays selectable and driver-visible via
    # bench exact_ms)
    assert FULL_CONFIG.raycast_shadow_subsample == 4
    assert FULL_CONFIG.scatter_bake == "radiance"
    assert FULL_CONFIG.volume_dtype == "float32"    # bf16: 3x measured loss
    # parity-path defaults stay exact
    assert DEMO_CONFIG.raycast_shadow_subsample == 1
