#!/usr/bin/env python3
"""Emit the platform YAML files under missions/<robot>/platform/.

Platform descriptions are physical facts of the vehicles (thrust/drag
coefficients, rotor ring geometry, spin alternation) expressed in the
eagle-mpc platform schema (keys: cf, cm, max/min_thrust, base_link_name,
n_rotors, $rotors with translation/orientation/spin_direction). Planar
multicopters are generated from ring parametrizations; the tilted-rotor
hextilt uses its measured rotor poses.

Run: python missions/generate_platforms.py
"""

import math
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def yaw_quat(angle):
    return [0.0, 0.0, round(math.sin(angle / 2), 6), round(math.cos(angle / 2), 6)]


def ring_rotors(radius, angles_deg, spins, z=0.0, yaw_orient=True):
    rotors = []
    for ang, spin in zip(angles_deg, spins):
        a = math.radians(ang)
        t = [round(radius * math.cos(a), 7), round(radius * math.sin(a), 7), z]
        q = yaw_quat(a) if yaw_orient else [0, 0, 0, 1]
        rotors.append({"translation": t, "orientation": q, "spin_direction": spin})
    return rotors


PLATFORMS = {
    # PX4 iris quadrotor (X layout, flat rotors)
    "iris": dict(
        cf=8.54858e-06, cm=1.3677728e-7, max_thrust=10.3437818,
        min_thrust=0.0854858, base_link_name="iris__base_link",
        rotors=[
            {"translation": [0.13, -0.22, 0.023], "orientation": [0, 0, 0, 1], "spin_direction": -1},
            {"translation": [-0.13, 0.2, 0.023], "orientation": [0, 0, 0, 1], "spin_direction": -1},
            {"translation": [0.13, 0.22, 0.023], "orientation": [0, 0, 0, 1], "spin_direction": 1},
            {"translation": [-0.13, -0.2, 0.023], "orientation": [0, 0, 0, 1], "spin_direction": 1},
        ],
    ),
    # iris with PX4 normalized-command thrust model
    "iris_px4": dict(
        cf=5.84e-06, cm=3.504e-7, max_thrust=7.0664, min_thrust=0.0584,
        base_link_name="iris__base_link",
        rotors=[
            {"translation": [0.13, -0.22, 0.023], "orientation": [0, 0, 0, 1], "spin_direction": -1},
            {"translation": [-0.13, 0.2, 0.023], "orientation": [0, 0, 0, 1], "spin_direction": -1},
            {"translation": [0.13, 0.22, 0.023], "orientation": [0, 0, 0, 1], "spin_direction": 1},
            {"translation": [-0.13, -0.2, 0.023], "orientation": [0, 0, 0, 1], "spin_direction": 1},
        ],
    ),
    # 370 mm hexacopter: rotor ring r=0.185, arms every 60 deg starting at 30
    "hexacopter370": dict(
        cf=4.138394792004922e-06, cm=6.991478005829954e-08,
        max_thrust=20.6991, min_thrust=0.0,
        base_link_name="hexacopter370__base_link",
        rotors=ring_rotors(0.185, [30, 90, 150, 210, 270, 330],
                           [-1, 1, -1, 1, -1, 1]),
    ),
    # 680 mm hexacopter: ring r=0.34
    "hexacopter680": dict(
        cf=5.226447359467059e-05, cm=1.0904825432024088e-06,
        max_thrust=24.8193, min_thrust=0.0,
        base_link_name="hexacopter680__base_link",
        rotors=ring_rotors(0.34, [30, 90, 150, 210, 270, 330],
                           [-1, 1, -1, 1, -1, 1]),
    ),
    # tilted-rotor fully actuated hexacopter (measured rotor poses)
    "hextilt": dict(
        cf=8.54858e-06, cm=1.3677728e-7, max_thrust=10.3437818,
        min_thrust=0.0854858, base_link_name="hextilt__base_link",
        rotors=[
            {"translation": [0.3907966465836527, 0.0299377136375720, -0.0427554860579147],
             "orientation": [0.2995615231515963, 0.0831219092134935, 0.0262082373043233, 0.9500877698156101],
             "spin_direction": -1},
            {"translation": [0.2213251438331876, 0.3234709668364263, -0.0427554860579147],
             "orientation": [-0.3009888436523893, -0.0777950765858490, 0.4523468856138499, 0.8359042631373822],
             "spin_direction": 1},
            {"translation": [-0.2213251438331875, 0.3234709668364264, -0.0427554860579147],
             "orientation": [0.0777950765858490, 0.3009888436523893, 0.8359042631373822, 0.4523468856138501],
             "spin_direction": -1},
            {"translation": [-0.3907966465836527, 0.0299377136375721, -0.0427554860579147],
             "orientation": [-0.0831219092134935, -0.2995615231515963, 0.9500877698156101, 0.0262082373043234],
             "spin_direction": 1},
            {"translation": [-0.1694715027504653, -0.3534086804739983, -0.0427554860579147],
             "orientation": [-0.2217664465657472, 0.2178669344388960, 0.8096960258330590, -0.4977408842017598],
             "spin_direction": -1},
            {"translation": [0.1694715027504649, -0.3534086804739985, -0.0427554860579147],
             "orientation": [-0.2178669344388958, 0.2217664465657473, -0.4977408842017603, 0.8096960258330587],
             "spin_direction": 1},
        ],
    ),
}

# robot directory -> platform key + platform file basename
TARGETS = {
    "iris": ("iris", "iris"),
    "iris_px4": ("iris_px4", "iris_px4"),
    "hexacopter370": ("hexacopter370", "hexacopter370"),
    "hexacopter370_flying_arm_3": ("hexacopter370", "hexacopter370"),
    "hexacopter680_flying_arm_2": ("hexacopter680", "hexacopter680"),
    "hextilt": ("hextilt", "hextilt"),
    "hextilt_flying_arm_5": ("hextilt", "hextilt"),
}


def emit(cfg):
    lines = ["platform:"]
    for k in ("cf", "cm", "max_thrust", "min_thrust"):
        lines.append(f"  {k}: {cfg[k]}")
    lines.append(f"  base_link_name: \"{cfg['base_link_name']}\"")
    lines.append(f"  n_rotors: {len(cfg['rotors'])}")
    lines.append("  $rotors:")
    for r in cfg["rotors"]:
        lines.append(f"    - translation: {r['translation']}")
        lines.append(f"      orientation: {r['orientation']}")
        lines.append(f"      spin_direction: [{r['spin_direction']}]")
    return "\n".join(lines) + "\n"


def main():
    for robot_dir, (platform, basename) in TARGETS.items():
        d = os.path.join(HERE, robot_dir, "platform")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, basename + ".yaml")
        with open(path, "w") as f:
            f.write("# generated by missions/generate_platforms.py\n")
            f.write(emit(PLATFORMS[platform]))
        print("wrote", path)


if __name__ == "__main__":
    main()
