from .fps import farthest_point_sampling
