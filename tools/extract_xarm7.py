"""One-shot extractor: xArm7 kinematic/inertial parameters from the
reference MJCF (data extraction, not code) -> dart_tpu/physics/xarm7_data.py.

Source of the numbers: `PMPC/models/xarm7/chainL.xml` (MuJoCo Menagerie
xArm7 description) and the defaults in `PMPC/models/xarm7/world_general.xml`:
all 7 arm joints are revolute about the body-frame z axis with
armature=0.1, frictionloss=1, damping per size class (size1=10, size2=5,
size3=2). The gripper subtree below `xarm_L_gripper_base_link` is lumped
into the terminal body (a rigid approximation: the reference commands the
gripper closed at 255 throughout — `PMPC/main.py:121`).
"""

import re
import sys
import xml.etree.ElementTree as ET

import numpy as np

SRC = "/root/reference/PMPC/models/xarm7/chainL.xml"
OUT = "dart_tpu/physics/xarm7_data.py"

DAMPING = {"size1": 10.0, "size2": 5.0, "size3": 2.0}
RANGE_DEFAULT = (-6.28319, 6.28319)


def fvec(s, n):
    v = [float(x) for x in s.split()]
    assert len(v) == n, (s, n)
    return v


def quat_to_R(q):
    w, x, y, z = np.asarray(q) / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def main():
    root = ET.parse(SRC).getroot()

    links = []           # the 7 joint-bearing links + base info

    def walk(body, depth):
        name = body.get("name", "")
        pos = fvec(body.get("pos", "0 0 0"), 3)
        quat = fvec(body.get("quat", "1 0 0 0"), 4)
        inert = body.find("inertial")
        joint = body.find("joint")
        children = body.findall("body")
        return {
            "name": name, "pos": pos, "quat": quat,
            "inertial": inert, "joint": joint, "children": children,
            "elem": body,
        }

    # Chain: L_link_base -> L_link1..7 -> gripper subtree.
    base = root.find("body")
    assert base.get("name") == "L_link_base"

    chain = [base]
    cur = base
    while True:
        nxt = None
        for b in cur.findall("body"):
            if re.match(r"L_link\d$", b.get("name", "")) or \
               b.get("name", "") == "xarm_L_gripper_base_link":
                nxt = b
                break
        if nxt is None:
            break
        chain.append(nxt)
        cur = nxt

    names = [b.get("name") for b in chain]
    assert names == ["L_link_base"] + [f"L_link{i}" for i in range(1, 8)] + \
        ["xarm_L_gripper_base_link"], names

    # Lump the whole gripper subtree (incl. its children) into the terminal
    # body, expressed in the gripper-base frame.
    def accumulate(body, X_R, X_p, acc):
        inert = body.find("inertial")
        if inert is not None:
            m = float(inert.get("mass", "0") or 0)
            ip = np.array(fvec(inert.get("pos", "0 0 0"), 3))
            iq = fvec(inert.get("quat", "1 0 0 0"), 4)
            di = np.array(fvec(inert.get("diaginertia", "0 0 0"), 3))
            R_i = X_R @ quat_to_R(iq)
            p_i = X_p + X_R @ ip
            I_w = R_i @ np.diag(di) @ R_i.T
            acc.append((m, p_i, I_w))
        for child in body.findall("body"):
            cp = np.array(fvec(child.get("pos", "0 0 0"), 3))
            cq = fvec(child.get("quat", "1 0 0 0"), 4)
            accumulate(child, X_R @ quat_to_R(cq), X_p + X_R @ cp, acc)

    grip = chain[-1]
    acc = []
    accumulate(grip, np.eye(3), np.zeros(3), acc)
    m_tot = sum(m for m, _, _ in acc)
    com = sum(m * p for m, p, _ in acc) / m_tot
    I_tot = np.zeros((3, 3))
    for m, p, I_w in acc:
        d = p - com
        I_tot += I_w + m * ((d @ d) * np.eye(3) - np.outer(d, d))

    out_links = []
    for b in chain[1:-1]:  # L_link1..7 (joint-bearing)
        inert = b.find("inertial")
        joint = b.find("joint")
        cls = joint.get("class")
        rng = joint.get("range")
        rng = fvec(rng, 2) if rng else list(RANGE_DEFAULT)
        ip = fvec(inert.get("pos", "0 0 0"), 3)
        iq = fvec(inert.get("quat", "1 0 0 0"), 4)
        di = fvec(inert.get("diaginertia"), 3)
        out_links.append({
            "name": b.get("name")[2:],  # strip L_ prefix
            "pos": fvec(b.get("pos", "0 0 0"), 3),
            "quat": fvec(b.get("quat", "1 0 0 0"), 4),
            "mass": float(inert.get("mass")),
            "com": ip, "icom_quat": iq, "diaginertia": di,
            "damping": DAMPING[cls], "range": rng,
        })

    grip_entry = {
        "name": "gripper_base",
        "pos": fvec(grip.get("pos", "0 0 0"), 3),
        "quat": fvec(grip.get("quat", "1 0 0 0"), 4),
        "mass": float(m_tot),
        "com": com.tolist(),
        "inertia_full": I_tot.tolist(),
    }
    base_entry = {
        "pos": fvec(base.get("pos", "0 0 0"), 3),
        "quat": fvec(base.get("quat", "1 0 0 0"), 4),
    }

    with open(OUT, "w") as f:
        f.write('"""xArm7 chain parameters, extracted from the reference\n'
                "MJCF (`PMPC/models/xarm7/chainL.xml`, MuJoCo Menagerie xArm7)\n"
                "by tools/extract_xarm7.py. Pure data.\n\n"
                "Joint model (world_general.xml defaults): revolute about the\n"
                "body-frame z axis, armature=0.1, frictionloss=1.0, damping\n"
                "per size class. The gripper subtree is lumped rigid into the\n"
                "terminal body (gripper commanded closed throughout).\n"
                '"""\n\n')
        f.write("ARMATURE = 0.1\nFRICTIONLOSS = 1.0\n\n")
        f.write(f"BASE = {base_entry!r}\n\n")
        f.write(f"LINKS = {out_links!r}\n\n")
        f.write(f"GRIPPER = {grip_entry!r}\n")
    print(f"wrote {OUT}: {len(out_links)} joint links, gripper mass "
          f"{m_tot:.4f} kg, com {com}")


if __name__ == "__main__":
    sys.exit(main())
