"""Host-side data pipeline: JSON filelists, episodic sampling, transforms,
QMUL trajectories, sines tasks, feature cache."""
from .feature_cache import init_loader, sample_feature_episode, save_features
from .filelist import EpisodicDataLoader, FileListMeta, SimpleDataLoader
from .qmul import get_batch, get_person_at_curve, sample_trajectory, test_people, train_people
from .sines import SineTask, TaskDistribution
from .transforms import TransformPipeline

__all__ = [
    "init_loader", "sample_feature_episode", "save_features",
    "EpisodicDataLoader", "FileListMeta", "SimpleDataLoader",
    "get_batch", "get_person_at_curve", "sample_trajectory",
    "test_people", "train_people",
    "SineTask", "TaskDistribution", "TransformPipeline",
]
