"""Meta-learning methods on the shared backbone/GP stack.

Method-string registry mirrors the reference CLI surface
(reference train.py:115-174, io_utils.py:23)."""
from .base import EpisodicMethod, MethodState
from .baseline import BaselineFinetune, BaselineTrain
from .dkt import DKT
from .dkt_regression import DKTRegression
from .feature_transfer import FeatureTransfer
from .maml import MAML
from .matchingnet import MatchingNet
from .protonet import ProtoNet
from .relationnet import RelationNet

CLASSIFICATION_METHODS = (
    "baseline",
    "baseline++",
    "DKT",
    "protonet",
    "matchingnet",
    "relationnet",
    "relationnet_softmax",
    "maml",
    "maml_approx",
)

REGRESSION_METHODS = ("DKT", "transfer")

__all__ = [
    "EpisodicMethod", "MethodState",
    "BaselineFinetune", "BaselineTrain", "DKT", "DKTRegression",
    "FeatureTransfer", "MAML", "MatchingNet", "ProtoNet", "RelationNet",
    "CLASSIFICATION_METHODS", "REGRESSION_METHODS",
]
