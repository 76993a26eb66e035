"""One-shot extractor: xArm7 kinematic/inertial parameters from the
reference's *compiled* MuJoCo model -> dart_tpu/physics/xarm7_data.py.

All reference worlds compile with ``inertiafromgeom="true"``
(`PMPC/models/xarm7/world_*.xml:3`, `RMPC/models_dual/xarm7/world_general.xml:3`,
`LMPC/models/xarm7/world_general.xml:3`), so MuJoCo IGNORES the hand-authored
``<inertial>`` tags in `chainL.xml` and recomputes mass/COM/inertia from the
mesh geoms. The authoritative inertial data is therefore the compiled
`MjModel`, not the XML — round 1 extracted from the XML tags and was ~30% off
on the mass matrix (caught by tests/test_mujoco_oracle.py).

This extractor loads `LMPC/models/xarm7/world_general.xml` (identical compiled
arm params to the PMPC worlds; the RMPC world only differs by the placeholder
object body that `rob_ctrl.py` rewrites) and reads:
- per-body parent-frame pos/quat (`body_pos`/`body_quat`),
- compiled mass / COM / inertia (`body_mass`/`body_ipos`/`body_iquat`/
  `body_inertia`),
- per-dof damping/armature/frictionloss (`dof_damping` etc.),
- joint ranges.

The gripper subtree below `xarm_L_gripper_base_link` is lumped rigid into the
terminal body at qpos0 (fingers open, the XML layout pose): the reference
commands the gripper closed at 255 throughout (`PMPC/main.py:121`) but the
moving finger mass is ~0.3 kg within a few cm, a sub-mm COM shift on the lump.
"""

import sys

import mujoco
import numpy as np

SRC = "/root/reference/LMPC/models/xarm7/world_general.xml"
OUT = "dart_tpu/physics/xarm7_data.py"


def quat_to_R(q):
    w, x, y, z = np.asarray(q) / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def main():
    model = mujoco.MjModel.from_xml_path(SRC)
    data = mujoco.MjData(model)
    mujoco.mj_forward(model, data)  # qpos0 kinematics for the gripper lump

    def bid(name):
        i = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_BODY, name)
        assert i >= 0, name
        return i

    def jid(name):
        i = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_JOINT, name)
        assert i >= 0, name
        return i

    base = bid("L_link_base")
    links = [bid(f"L_link{i}") for i in range(1, 8)]
    grip = bid("xarm_L_gripper_base_link")
    joints = [jid(f"L_joint{i}") for i in range(1, 8)]
    dofs = [int(model.jnt_dofadr[j]) for j in joints]
    for j in joints:  # chain.py assumes body-frame z-axis revolute joints
        assert model.jnt_type[j] == mujoco.mjtJoint.mjJNT_HINGE
        assert np.allclose(model.jnt_axis[j], [0, 0, 1]), model.jnt_axis[j]
        assert np.allclose(model.jnt_pos[j], 0.0), model.jnt_pos[j]

    out_links = []
    for k, b in enumerate(links):
        j, d = joints[k], dofs[k]
        out_links.append({
            "name": f"link{k + 1}",
            "pos": model.body_pos[b].tolist(),
            "quat": model.body_quat[b].tolist(),
            "mass": float(model.body_mass[b]),
            "com": model.body_ipos[b].tolist(),
            "icom_quat": model.body_iquat[b].tolist(),
            "diaginertia": model.body_inertia[b].tolist(),
            "damping": float(model.dof_damping[d]),
            "range": model.jnt_range[j].tolist(),
        })

    # Lump the gripper subtree rigid at qpos0, expressed in the gripper-base
    # frame (world kinematics from mj_forward at qpos0).
    def subtree(b):
        out = [b]
        for c in range(model.nbody):
            if model.body_parentid[c] == b and c != b:
                out += subtree(c)
        return out

    Rg = data.xmat[grip].reshape(3, 3)
    pg = data.xpos[grip]
    acc = []
    for b in subtree(grip):
        m = float(model.body_mass[b])
        if m <= 0:
            continue
        p_w = data.xipos[b]
        R_iw = data.ximat[b].reshape(3, 3)
        I_w = R_iw @ np.diag(model.body_inertia[b]) @ R_iw.T
        # into gripper-base frame
        p_l = Rg.T @ (p_w - pg)
        I_l = Rg.T @ I_w @ Rg
        acc.append((m, p_l, I_l))
    m_tot = sum(m for m, _, _ in acc)
    com = sum(m * p for m, p, _ in acc) / m_tot
    I_tot = np.zeros((3, 3))
    for m, p, I_l in acc:
        d = p - com
        I_tot += I_l + m * ((d @ d) * np.eye(3) - np.outer(d, d))

    grip_entry = {
        "name": "gripper_base",
        "pos": model.body_pos[grip].tolist(),
        "quat": model.body_quat[grip].tolist(),
        "mass": float(m_tot),
        "com": com.tolist(),
        "inertia_full": I_tot.tolist(),
    }
    base_entry = {
        "pos": model.body_pos[base].tolist(),
        "quat": model.body_quat[base].tolist(),
    }
    armature = [float(model.dof_armature[d]) for d in dofs]
    frictionloss = [float(model.dof_frictionloss[d]) for d in dofs]

    with open(OUT, "w") as f:
        f.write('"""xArm7 chain parameters, extracted from the reference\'s\n'
                "COMPILED MuJoCo model (`LMPC/models/xarm7/world_general.xml`;\n"
                "the worlds set inertiafromgeom=true so the compiled inertials,\n"
                "not the XML <inertial> tags, are ground truth) by\n"
                "tools/extract_xarm7.py. Pure data.\n\n"
                "Joint model: revolute about the body-frame z axis; damping/\n"
                "armature/frictionloss per compiled dof. The gripper subtree is\n"
                "lumped rigid into the terminal body at qpos0 (gripper commanded\n"
                "closed throughout; finger motion shifts the lump COM < 1 mm).\n"
                "Parity vs mj_fullM/qfrc_bias/mj_jacBody is gated by\n"
                "tests/test_mujoco_oracle.py.\n"
                '"""\n\n')
        f.write(f"ARMATURE = {armature!r}\n")
        f.write(f"FRICTIONLOSS = {frictionloss!r}\n\n")
        f.write(f"BASE = {base_entry!r}\n\n")
        f.write(f"LINKS = {out_links!r}\n\n")
        f.write(f"GRIPPER = {grip_entry!r}\n")
    print(f"wrote {OUT}: gripper lump {m_tot:.4f} kg com {com}")


if __name__ == "__main__":
    sys.exit(main())
