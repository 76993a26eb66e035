"""Household-object presets beyond the canonical {cube, cylinder, sphere}.

The reference ships 50+ extra object MJCFs (`PMPC/object_sim/`, the
`world_{bowl,wineglass,waterbottle,teapot,pan,knife}.xml` variants and
`burger_on_plate.xml` — SURVEY C15e). In the tray_object parameter space a
scene is a parameter row, so each asset reduces to {mass, footprint
half-widths, COM height, rolling signature, rocking mask}. The numbers here
are EXTRACTED from the reference's own compiled models
(tools/extract_object_presets.py: `body_subtreemass`, per-geom `geom_aabb`
footprint/height, `body_ipos` COM height above the support plane) — not
guessed. All these items slide rather than roll (kappa_inv = 0) and can
rock/topple about both support axes; the geometry fidelity is the
support-polygon + COM-height approximation the contact model consumes
(`tray_object.py` rocking/toppling terms, `rlmpc2.py:734-736`).
"""

from __future__ import annotations

import jax.numpy as jnp

from dart_tpu.physics.tray_object import TrayObjectParams

# name -> (mass kg, half_w x, half_w y, h_com m)
# extracted from the compiled world_{name}.xml / burger_on_plate.xml
PRESETS = {
    # wide low bowl: big footprint, mid COM
    "bowl":        (0.806, 0.047, 0.061, 0.051),
    # tall stemware: small base, high COM — the toppling stress case
    "wineglass":   (0.564, 0.025, 0.029, 0.086),
    # upright bottle: small round base, mid COM
    "waterbottle": (0.636, 0.021, 0.021, 0.043),
    "teapot":      (0.689, 0.063, 0.049, 0.066),
    "pan":         (0.573, 0.077, 0.057, 0.055),
    # knife lying flat: extreme footprint asymmetry
    "knife":       (0.517, 0.006, 0.044, 0.107),
    # plate + burger payload (`burger_on_plate.xml:24`: r=0.12 cylinder
    # collision footprint, combined COM ~2.5 cm up, density-800 plate)
    "burger_on_plate": (1.20, 0.12, 0.12, 0.025),
}


def make_preset_params(name: str, mu: float = 0.3,
                       tray_height: float = 0.4,
                       slip_eps: float = 2e-3, omega_n: float = 40.0,
                       zeta: float = 1.0, dtype=jnp.float32,
                       mass: float | None = None) -> TrayObjectParams:
    """TrayObjectParams for a named household preset (see PRESETS)."""
    m0, hx, hy, hcom = PRESETS[name]
    a = lambda x: jnp.asarray(x, dtype)
    return TrayObjectParams(
        mass=a(mass if mass is not None else m0), mu=a(mu),
        kappa_inv=a([0.0, 0.0]),          # household items slide, not roll
        slip_eps=a(slip_eps), omega_n=a(omega_n), zeta=a(zeta),
        tray_pos=a([0.0, 0.0, tray_height]),
        half_w=a([hx, hy]), h_com=a(hcom),
        topple_on=a([1.0, 1.0]))
