"""Config layer tests: parser flattening, platform math, spec building, and
schema compatibility with the upstream eagle-mpc YAML tree (when present)."""

import glob
import os

import numpy as np
import pytest

from eagle_mpc_tpu.config import specs
from eagle_mpc_tpu.config.parser import ParamsServer, ParserYaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MISSIONS = os.path.join(REPO, "missions")
REFERENCE_YAML = "/root/reference/yaml"


class TestParser:
    def test_trajectory_flattening(self):
        p = ParserYaml(os.path.join(MISSIONS, "iris/trajectories/hover.yaml"),
                       yaml_dir=MISSIONS)
        params = p.get_params()
        assert params["robot/name"] == "iris"
        # platform pulled in via follow: into the same prefix
        assert float(params["robot/platform/cf"]) == pytest.approx(8.54858e-06)
        assert len(params["robot/platform/rotors"]) == 4
        stages = params["stages"]
        assert [s["name"] for s in stages] == ["approach", "hover"]
        assert stages[0]["transition"] is True
        assert stages[1]["transition"] is False
        assert params["stages/hover/costs/pose/weight"] == 2000
        assert params["stages/approach/costs/reg_state/activation"] == "ActivationModelWeightedQuad"

    def test_mpc_flattening(self):
        p = ParserYaml(os.path.join(MISSIONS, "hexacopter370_flying_arm_3/mpc/mpc.yaml"),
                       yaml_dir=MISSIONS)
        params = p.get_params()
        assert params["mpc_controller/knots"] == 30
        assert params["mpc_controller/solver"] == "SolverSbFDDP"
        assert len(params["mpc_controller/carrot_tail_act_weights"]) == 18

    def test_missing_key_raises(self):
        p = ParserYaml(os.path.join(MISSIONS, "iris/trajectories/hover.yaml"),
                       yaml_dir=MISSIONS)
        server = ParamsServer(p.get_params())
        from eagle_mpc_tpu.config.parser import MissingValueException

        with pytest.raises(MissingValueException):
            server.get_double("nope/not/here")


class TestPlatform:
    def test_iris_allocation_matrix(self):
        spec = specs.load_trajectory("iris/trajectories/hover.yaml", yaml_dir=MISSIONS)
        tau_f = spec.platform.tau_f
        assert tau_f.shape == (6, 4)
        # flat rotors: all thrust along +z, no x/y force authority
        np.testing.assert_allclose(tau_f[0:2, :], 0, atol=1e-12)
        np.testing.assert_allclose(tau_f[2, :], 1, atol=1e-12)
        # torque rows = p x e3: roll = +y_i, pitch = -x_i
        np.testing.assert_allclose(tau_f[3, :], [-0.22, 0.2, 0.22, -0.2], atol=1e-9)
        np.testing.assert_allclose(tau_f[4, :], [-0.13, 0.13, -0.13, 0.13], atol=1e-9)
        # yaw torque sign = spin direction
        cm_cf = spec.platform.cm / spec.platform.cf
        np.testing.assert_allclose(tau_f[5, :], [-cm_cf, -cm_cf, cm_cf, cm_cf], atol=1e-9)

    def test_hextilt_fully_actuated(self):
        spec = specs.load_trajectory.__wrapped__ if hasattr(specs.load_trajectory, "__wrapped__") else None
        traj = specs.load_trajectory("hextilt/trajectories/hover.yaml", yaml_dir=MISSIONS) \
            if os.path.exists(os.path.join(MISSIONS, "hextilt/trajectories/hover.yaml")) else None
        if traj is None:
            pytest.skip("hextilt mission not yet authored")
        assert np.linalg.matrix_rank(traj.platform.tau_f, tol=1e-6) == 6

    def test_control_limits_with_arm(self):
        spec = specs.load_trajectory(
            "hexacopter370_flying_arm_3/trajectories/displacement.yaml", yaml_dir=MISSIONS)
        assert spec.platform.nu == 9
        np.testing.assert_allclose(spec.platform.u_lb[:6], 0.0)
        np.testing.assert_allclose(spec.platform.u_ub[:6], 20.6991)
        np.testing.assert_allclose(spec.platform.u_ub[6:], spec.model.effort_limit)
        np.testing.assert_allclose(spec.platform.u_lb[6:], -spec.model.effort_limit)


class TestTrajectorySpec:
    def test_flagship_mission(self):
        spec = specs.load_trajectory(
            "hexacopter370_flying_arm_3/trajectories/displacement.yaml", yaml_dir=MISSIONS)
        assert spec.model.nq == 10 and spec.model.nv == 9
        assert len(spec.stages) == 4
        assert spec.duration == 4000
        assert [s.transition for s in spec.stages] == [True, False, True, False]
        wp2 = spec.stages[3]
        assert wp2.costs[0].type == specs.COST_FRAME_PLACEMENT
        assert wp2.costs[0].frame_id == spec.model.frame_id("flying_arm_3__gripper")
        limits = spec.stages[0].costs[1]
        assert limits.activation == specs.ACT_WEIGHTED_QUAD_BARRIER
        assert limits.lower_bound is not None and limits.nr == 18
        assert not spec.has_contact

    def test_mpc_params(self):
        mp = specs.load_mpc_params("hexacopter370_flying_arm_3/mpc/mpc.yaml", yaml_dir=MISSIONS)
        assert mp.knots == 30 and mp.dt == 30 and mp.iters == 2
        assert mp.solver == specs.SOLVER_SBFDDP
        assert mp.integration_method == specs.INTEGRATOR_EULER
        assert mp.model.nq == 10


@pytest.mark.skipif(not os.path.isdir(REFERENCE_YAML), reason="reference yaml not mounted")
class TestUpstreamSchemaCompat:
    """Every mission in the upstream eagle-mpc yaml/ tree must load through
    our parser + spec builder (the 'all files under yaml/ load' checklist item
    of SURVEY.md §7), using our authored URDFs for the robot models."""

    def test_all_upstream_trajectories_load(self):
        files = sorted(glob.glob(os.path.join(REFERENCE_YAML, "*", "trajectories", "*.yaml")))
        assert files
        for f in files:
            spec = specs.load_trajectory(f, yaml_dir=REFERENCE_YAML)
            assert spec.model.nx == len(spec.initial_state)
            assert len(spec.stages) >= 1

    def test_all_upstream_mpc_configs_load(self):
        files = sorted(glob.glob(os.path.join(REFERENCE_YAML, "*", "mpc", "mpc.yaml")))
        assert files
        for f in files:
            mp = specs.load_mpc_params(f, yaml_dir=REFERENCE_YAML)
            assert mp.knots > 0 and mp.dt > 0


class TestConverterCodecs:
    """Full converter<T> parity (reference include/eagle_mpc/utils/
    converter.hpp:100-262 + converter_utils.cpp) with reference-format
    strings, incl. the dynamic-Eigen / pair / map forms round-1 lacked."""

    def test_static_vector(self):
        from eagle_mpc_tpu.config import converter as cvt
        np.testing.assert_allclose(cvt.convert_matrix("[1,2.5,-3]"),
                                   [1.0, 2.5, -3.0])

    def test_dynamic_matrix(self):
        from eagle_mpc_tpu.config import converter as cvt
        m = cvt.convert_matrix("[[2,3],1,2,3,4,5,6]")
        np.testing.assert_allclose(m, [[1, 2, 3], [4, 5, 6]])

    def test_dynamic_matrix_dim_mismatch_raises(self):
        from eagle_mpc_tpu.config import converter as cvt
        with pytest.raises(ValueError):
            cvt.convert_matrix("[[2,2],1,2,3]")

    def test_pair(self):
        from eagle_mpc_tpu.config import converter as cvt
        assert cvt.convert_pair("{gain:2.5}") == ("gain", 2.5)
        assert cvt.convert_pair("{name:hexa}", str) == ("name", "hexa")

    def test_map(self):
        from eagle_mpc_tpu.config import converter as cvt
        m = cvt.convert_map("[{kp:1.5},{kd:0.25}]")
        assert m == {"kp": 1.5, "kd": 0.25}

    def test_map_invalid_raises(self):
        from eagle_mpc_tpu.config import converter as cvt
        with pytest.raises(ValueError):
            cvt.convert_map("[kp:1.5]")

    def test_parse_list_nested(self):
        from eagle_mpc_tpu.config import converter as cvt
        assert cvt.parse_list("[a,[b,c],{d:e}]") == ["a", "[b,c]", "{d:e}"]

    def test_roundtrip_serialization(self):
        from eagle_mpc_tpu.config import converter as cvt
        m = np.arange(6.0).reshape(2, 3)
        s = cvt.to_string(m)
        assert s.startswith("[[2,3],")
        np.testing.assert_allclose(cvt.convert_matrix(s), m)
        d = {"a": 1.0, "b": -2.5}
        assert cvt.convert_map(cvt.to_string(d)) == d

    def test_params_server_getters(self):
        from eagle_mpc_tpu.config.parser import ParamsServer
        server = ParamsServer({
            "mat": "[[2,2],1,2,3,4]",
            "vec": "[1,2,3]",
            "vec_dyn": "[[1,3],7,8,9]",
            "gains": "[{kp:10},{kd:2}]",
            "pair": "{mass:1.52}",
        })
        np.testing.assert_allclose(server.get_matrix("mat"), [[1, 2], [3, 4]])
        np.testing.assert_allclose(server.get_matrix("vec"), [1, 2, 3])
        np.testing.assert_allclose(server.get_vector("vec_dyn"), [7, 8, 9])
        assert server.get_map("gains") == {"kp": 10.0, "kd": 2.0}
        assert server.get_pair("pair") == ("mass", 1.52)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
