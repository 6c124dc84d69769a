from .types import *  # noqa: F401,F403
from .grid_config import GridConfig  # noqa: F401
from .grid import Grid, BandDesc  # noqa: F401
from .point_cloud import PointCloud, ChannelDesc  # noqa: F401
