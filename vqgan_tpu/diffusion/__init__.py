from .continuous_time import (
    ContinuousTimeGaussianDiffusion,
    LearnedLogSNR,
    VParamContinuousTimeGaussianDiffusion,
)
from .elucidated import ElucidatedDiffusion
from .gaussian import GaussianDiffusion
from .guided import GuidedGaussianDiffusion, make_classifier_cond_fn
from .learned_variance import LearnedVarianceGaussianDiffusion
from .repaint import RePaintDiffusion
from .weighted_objective import WeightedObjectiveGaussianDiffusion
