from . import se3
from .registration import point_to_plane_icp, RegistrationResult
from .voxel_map import VoxelMap
from .pipeline import LidarOdometry, OdometryConfig
from .evaluate import absolute_trajectory_error, umeyama_alignment
from .imu import ImuState, propagate
from .semantic_slam import SemanticSLAM, SlamConfig
from .pose_graph import PoseGraph, optimize
from .ba import BAProblem, run_ba, run_ba_sharded
