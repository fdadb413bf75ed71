from .batching import CollatedBatch, CollatedBatcher, SceneBatch, SceneBatcher, pad_scenes
from .dataset import TrajectoryData, augment_trajectory, load_trajectory_data
