"""Fleet CLI (gnc-equivalent multi-host compose fan-out) + stabilized frame.

The reference deploys split topologies with ``gnc``
(``debian/gisnav/usr/bin/gnc`` in hmakelin/gisnav): compose verbs addressed
per-service to remote hosts over ssh. These tests pin the addressing and
command-construction semantics without touching docker/ssh (--dry-run).
"""
import numpy as np

from gisnav_tpu.cli import _fleet_groups, main


class TestFleetGroups:
    def test_plain_services_run_locally(self):
        assert _fleet_groups(["a", "b"], None) == {None: ["a", "b"]}

    def test_service_at_remote_addressing(self):
        groups = _fleet_groups(["mapserver@gis", "postgres@gis", "gisnav"],
                               None)
        assert groups["gis"] == ["mapserver", "postgres"]
        assert groups[None] == ["gisnav"]

    def test_hosts_flag_fans_out_plain_services(self):
        groups = _fleet_groups(["ps"], ["a@h1", "b@h2"])
        assert groups == {"a@h1": ["ps"], "b@h2": ["ps"]}

    def test_no_services_targets_hosts(self):
        groups = _fleet_groups([], ["a@h1"])
        assert groups == {"a@h1": []}


class TestFleetDryRun:
    def test_local_command(self, capsys):
        rc = main(["fleet", "--dry-run", "up", "gisnav"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "[local] docker compose -p gisnav-tpu" in out
        assert out.strip().endswith("up gisnav")

    def test_remote_uses_checkout_relative_compose_file(self, capsys):
        rc = main(["fleet", "--dry-run", "--host", "gis@10.0.0.2",
                   "up", "mapserver"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "ssh -o BatchMode=yes gis@10.0.0.2" in out
        assert "cd ~/gisnav_tpu &&" in out
        assert "-f docker/docker-compose.yaml" in out

    def test_extra_args_pass_through(self, capsys):
        rc = main(["fleet", "--dry-run", "up", "gisnav", "--extra=-d"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "up -d gisnav" in out


class TestStabilizedFrame:
    def test_roll_pitch_removed_yaw_kept(self):
        from gisnav_tpu.geometry.quaternion import (
            euler_to_quat,
            matrix_to_quat,
            quat_to_euler,
            quat_to_matrix,
        )
        from gisnav_tpu.geometry.se3 import make_transform
        from gisnav_tpu.nodes.bbox_node import BBoxNode
        from gisnav_tpu.nodes.bus import LocalBus
        from gisnav_tpu.nodes.tf import TransformGraph

        tf = TransformGraph()
        node = BBoxNode(LocalBus(), tf=tf)
        q = euler_to_quat(0.2, -0.1, 0.9)  # rolling + pitching vehicle
        t = np.array([10.0, -5.0, 120.0])
        tf.add("gisnav_map", "gisnav_base_link",
               make_transform(quat_to_matrix(q), t), 1000)

        node._publish_stabilized_frame(1000)
        h = tf.lookup("gisnav_map", "gisnav_base_link_stabilized", 1000)
        roll, pitch, yaw = quat_to_euler(matrix_to_quat(h[:3, :3]))
        assert abs(roll) < 1e-9 and abs(pitch) < 1e-9
        assert abs(yaw - 0.9) < 1e-9
        np.testing.assert_allclose(h[:3, 3], t)

    def test_missing_base_link_is_noop(self):
        from gisnav_tpu.nodes.bbox_node import BBoxNode
        from gisnav_tpu.nodes.bus import LocalBus
        from gisnav_tpu.nodes.tf import TransformGraph

        tf = TransformGraph()
        node = BBoxNode(LocalBus(), tf=tf)
        node._publish_stabilized_frame(1000)  # must not raise
        assert not tf.can_transform("gisnav_map",
                                    "gisnav_base_link_stabilized")
