from .umap_plots import plot_embeddings_2d, project_2d  # noqa: F401
