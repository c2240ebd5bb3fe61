"""Data-preparation tools mirroring the reference's numbered pipeline:
colorize_models (2_1), render_training_pairs (2_2), scene_gen_detection
(1_1), render_train_views (render_training_img.py), convert_weights (4)."""
