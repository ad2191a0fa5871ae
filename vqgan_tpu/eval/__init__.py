from .classifier import ClassifierExperiment, run_multi_seed
from .fid import FIDEvaluation, FIDStats, frechet_distance
from .metrics import mse, psnr, ssim, ssim_simplified
from .tsne import embed_user_features, select_extreme_users, tsne
