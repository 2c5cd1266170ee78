#!/usr/bin/env python3
"""Generate the URDF robot-description assets shipped with eagle_mpc_tpu.

The reference framework loads its URDFs from the external
``example_robot_data`` package (see /root/reference/config/path.py.in), which
is not vendored here. These models are AUTHORED for this framework: the
kinematic layout (free-flyer multicopter base + serial arm) and the
state/control dimensions match the reference missions (SURVEY.md §2a table),
while the inertial values are physically consistent estimates (box/cylinder
inertias at the stated masses). All mission YAML under ``missions/`` was
written against these models.

Run:  python robots/generate.py   (regenerates all .urdf files in place)
"""

import os

HERE = os.path.dirname(os.path.abspath(__file__))


def box_inertia(m, x, y, z):
    return (m / 12 * (y * y + z * z), m / 12 * (x * x + z * z), m / 12 * (x * x + y * y))


def rod_inertia_z(m, r, h):
    """Solid cylinder along z."""
    ixx = m / 12 * (3 * r * r + h * h)
    return (ixx, ixx, m / 2 * r * r)


def link(name, mass, ixx, iyy, izz, com=(0, 0, 0)):
    return f"""  <link name="{name}">
    <inertial>
      <origin xyz="{com[0]} {com[1]} {com[2]}" rpy="0 0 0"/>
      <mass value="{mass}"/>
      <inertia ixx="{ixx:.8g}" ixy="0" ixz="0" iyy="{iyy:.8g}" iyz="0" izz="{izz:.8g}"/>
    </inertial>
  </link>
"""


def frame_link(name):
    return f"""  <link name="{name}"/>
"""


def joint(name, jtype, parent, child, xyz, rpy=(0, 0, 0), axis=None, effort=None,
          lower=None, upper=None, velocity=None):
    s = f"""  <joint name="{name}" type="{jtype}">
    <origin xyz="{xyz[0]} {xyz[1]} {xyz[2]}" rpy="{rpy[0]} {rpy[1]} {rpy[2]}"/>
    <parent link="{parent}"/>
    <child link="{child}"/>
"""
    if axis is not None:
        s += f"""    <axis xyz="{axis[0]} {axis[1]} {axis[2]}"/>
"""
    if effort is not None:
        s += (f"""    <limit effort="{effort}" velocity="{velocity}" """
              f"""lower="{lower}" upper="{upper}"/>\n""")
    s += "  </joint>\n"
    return s


def multicopter(prefix, mass, ix, iy, iz):
    return link(f"{prefix}__base_link", mass, ix, iy, iz)


def serial_arm(arm_prefix, base_parent, mount_xyz, n_links, link_len, link_mass,
               effort, gripper=False):
    """A hanging serial arm: joint 1 about z, the rest about y; links extend
    downwards (-z). Returns urdf string."""
    s = frame_link(f"{arm_prefix}__base_link")
    s += joint(f"{arm_prefix}__mount", "fixed", base_parent,
               f"{arm_prefix}__base_link", mount_xyz)
    parent = f"{arm_prefix}__base_link"
    for i in range(1, n_links + 1):
        lname = f"{arm_prefix}__link_{i}"
        r = 0.015
        ixx, iyy, izz = rod_inertia_z(link_mass, r, link_len)
        s += link(lname, link_mass, ixx, iyy, izz, com=(0, 0, -link_len / 2))
        axis = (0, 0, 1) if i == 1 else (0, 1, 0)
        origin = (0, 0, 0) if i == 1 else (0, 0, -link_len)
        s += joint(f"{arm_prefix}__j{i}", "revolute", parent, lname, origin,
                   axis=axis, effort=effort, lower=-3.14159, upper=3.14159,
                   velocity=10.0)
        parent = lname
    if gripper:
        s += frame_link(f"{arm_prefix}__gripper")
        s += joint(f"{arm_prefix}__gripper_fix", "fixed", parent,
                   f"{arm_prefix}__gripper", (0, 0, -link_len))
    return s


def write(path, name, body):
    full = f"""<?xml version="1.0"?>
<!-- Authored for eagle_mpc_tpu by robots/generate.py - do not edit by hand. -->
<robot name="{name}">
{body}</robot>
"""
    p = os.path.join(HERE, path)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        f.write(full)
    print("wrote", p)


def main():
    # iris quadrotor: public PX4/RotorS parameters (mass 1.5 kg)
    iris = multicopter("iris", 1.52, 0.0347563, 0.0458929, 0.0977)
    write("iris_description/robots/iris.urdf", "iris", iris)
    write("iris_description/robots/iris_px4.urdf", "iris_px4", iris)

    # hexacopter370: small 370 mm hexacopter, ~1.4 kg
    hexa370 = multicopter("hexacopter370", 1.42, 0.0117, 0.0117, 0.0222)
    write("hexacopter370_description/urdf/hexacopter370.urdf", "hexacopter370", hexa370)

    # hexacopter370 + flying_arm_3 (3 revolute joints, gripper tip frame)
    fa3 = serial_arm("flying_arm_3", "hexacopter370__base_link",
                     (0, 0, -0.05), 3, 0.12, 0.12, effort=0.8, gripper=True)
    write("hexacopter370_description/urdf/hexacopter370_flying_arm_3.urdf",
          "hexacopter370_flying_arm_3", hexa370 + fa3)

    # hexacopter680: 680 mm class, ~3.1 kg
    hexa680 = multicopter("hexacopter680", 3.08, 0.0442, 0.0442, 0.0825)
    fa2 = serial_arm("flying_arm_2", "hexacopter680__base_link",
                     (0, 0, -0.07), 2, 0.18, 0.25, effort=2.0)
    write("hexacopter680_description/urdf/hexacopter680_flying_arm_2.urdf",
          "hexacopter680_flying_arm_2", hexa680 + fa2)

    # hextilt: tilted-rotor fully-actuated hexacopter, ~2.9 kg
    hextilt = multicopter("hextilt", 2.9, 0.0562, 0.0562, 0.1028)
    write("hextilt_description/urdf/hextilt.urdf", "hextilt", hextilt)

    fa5 = serial_arm("flying_arm_5", "hextilt__base_link",
                     (0, 0, -0.08), 5, 0.10, 0.10, effort=1.2, gripper=True)
    write("hextilt_description/urdf/hextilt_flying_arm_5.urdf",
          "hextilt_flying_arm_5", hextilt + fa5)


if __name__ == "__main__":
    main()
