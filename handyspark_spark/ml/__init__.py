from .pca import covariance_plan, pca_fit, pca_project
