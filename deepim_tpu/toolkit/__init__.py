"""Offline data-preparation toolkit (reference toolkit/, SURVEY.md §2.8).

Each module is a runnable CLI (`python -m deepim_tpu.toolkit.<name> ...`)
mirroring one stage of the reference pipeline, with rendering done by the
deepim_tpu batched rasterizer on device instead of glumpy/OpenGL:

* gen_gt_observed      — LM6d_0_gen_gt_observed.py
* gen_rendered_pose    — LM6d_1_gen_rendered_pose.py
* gen_rendered         — LM6d_2_gen_rendered.py
* gen_posecnn_rendered — LM6d_3_gen_PoseCNN_pred_rendered.py
* syn_poses            — LM6d_ds_0_gen_observed_poses.py (+ ds check)
* adapt_devkit         — LM6d_devkit/LM6d_0_rescale_models.py, LM6d_1_calc_extents.py
* stats                — lib/pair_matching/stat_se3.py, stat_depth.py
* gen_video            — gen_video_* family
"""
