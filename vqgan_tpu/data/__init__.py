from .datasets import (
    BatchLoader,
    ImageFolderDataset,
    SyntheticDataset,
    load_image,
)
from .gmm import (
    calinski_harabasz_score,
    davies_bouldin_score,
    gmm_aic,
    gmm_bic,
    gmm_fit,
    gmm_predict,
    largest_remainder_quotas,
    pca_fit,
    silhouette_score,
    standardize,
    stratified_sample_from_clusters,
)
from .latent_cache import LatentCache, LatentDataset, cache_filename
from .splits import (
    create_data_split,
    load_split,
    save_split,
    uniform_indices,
    verify_split,
)
