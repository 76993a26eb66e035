"""One-shot extractor: household-object preset parameters from the
reference's compiled world variants -> dart_tpu/physics/object_presets.py
numbers (data extraction, not code).

For each `PMPC/models/xarm7/world_{name}.xml`, loads the compiled model and
reads the free object body's subtree mass, the xy half-extents of its geom
AABB footprint, and the COM height above the AABB bottom — the quantities
the tray_object contact model consumes (support polygon + COM height).
"""

import numpy as np

import mujoco

WORLDS = ["world_bowl", "world_wineglass", "world_waterbottle",
          "world_teapot", "world_pan", "world_knife"]
BASE = "/root/reference/PMPC/models/xarm7"


def main():
    for f in WORLDS:
        m = mujoco.MjModel.from_xml_path(f"{BASE}/{f}.xml")
        frees = [j for j in range(m.njnt)
                 if m.jnt_type[j] == mujoco.mjtJoint.mjJNT_FREE]
        for j in frees:
            b = int(m.jnt_bodyid[j])
            name = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_BODY, b)
            if name == "tray":
                continue
            lo = np.full(3, np.inf)
            hi = np.full(3, -np.inf)
            for g in range(m.ngeom):
                if m.geom_bodyid[g] == b:
                    c = m.geom_aabb[g][:3] + m.geom_pos[g]
                    h = m.geom_aabb[g][3:]
                    lo = np.minimum(lo, c - h)
                    hi = np.maximum(hi, c + h)
            com = m.body_ipos[b]
            half = (hi[:2] - lo[:2]) / 2
            print(f'    "{f.removeprefix("world_")}": '
                  f'({m.body_subtreemass[b]:.3f}, {half[0]:.3f}, '
                  f'{half[1]:.3f}, {com[2] - lo[2]:.3f}),')


if __name__ == "__main__":
    main()
