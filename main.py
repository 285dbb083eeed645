"""Eagle-TPU CLI: broadcast clip -> tracking data + annotated video.

Reference-compatible entry point (reference main.py:14-86):

    python main.py --video_path clip.mp4 --fps 24

writes output/<video_name>/{raw_coordinates.json, raw_data.json,
metadata.json, processed_data.json, annotated.mp4} with the schemas in
docs/data.md.  Extra optional flags select model checkpoints (converted
torch weights); without weights the models run randomly initialized,
which exercises the pipeline but produces no real detections.
"""

import itertools
import json
import os
import sys
from argparse import ArgumentParser

from eagle_tpu.io import VideoFrameSource, iter_video, read_video_array, write_video
from eagle_tpu.pipeline.coordinate_model import CoordinateModel
from eagle_tpu.pipeline.processor import Processor
from eagle_tpu.utils.render import render_annotated_frames


def main():
    parser = ArgumentParser()
    parser.add_argument("--video_path", type=str, required=True)
    parser.add_argument("--fps", type=int, default=24)
    parser.add_argument("--keypoint_weights", type=str, default=None, help=".pth HRNet checkpoint")
    parser.add_argument("--detector_weights", type=str, default=None, help="YOLOv8 state_dict (.pt)")
    parser.add_argument(
        "--reid_weights",
        type=str,
        default=None,
        help="OSNet-x0.25 ReID checkpoint (.pt or converted .msgpack); "
        "enables appearance association in the tracker, the reference's "
        "default BotSort configuration (osnet_x0_25_msmt17.pt) -- off by "
        "default, documented deviation #10 in docs/parity.md",
    )
    parser.add_argument("--num_homography", type=int, default=1)
    parser.add_argument("--num_keypoint_detection", type=int, default=3)
    parser.add_argument("--calibration", action="store_true")
    parser.add_argument("--smooth", action="store_true")
    parser.add_argument(
        "--profile",
        action="store_true",
        help="print a per-stage wall-clock summary (upload, detector, "
        "keypoints, scan, assembly) to stderr after the perception pass "
        "(eagle_tpu.utils.profiling.StageTimer; SURVEY.md section 5.1 -- "
        "the structured replacement for the reference's tqdm-only view)",
    )
    parser.add_argument(
        "--segment_frames",
        type=int,
        default=0,
        help="process the video as a bounded-memory stream in blocks of "
        "this many frames (0 = load the whole clip, the reference "
        "behavior); full-match videos that do not fit in RAM need this",
    )
    args = parser.parse_args()

    video_name = args.video_path.split("/")[-1].split(".")[0]
    root = f"output/{video_name}"
    os.makedirs(root, exist_ok=True)

    if args.keypoint_weights is None or args.detector_weights is None:
        print(
            "WARNING: running without trained weights "
            "(--keypoint_weights / --detector_weights not given)"
        )
    # --reid_weights alone is enough: the config's use_appearance default
    # is "auto" (None) and CoordinateModel flips it on when ReID weights
    # are supplied, matching the reference's weights-present-implies-ReID
    # construction (reference coordinate_model.py:68-72).
    model = CoordinateModel(
        keypoint_checkpoint=args.keypoint_weights,
        detector_checkpoint=args.detector_weights,
        reid_checkpoint=args.reid_weights,
    )
    timer = None
    if args.profile:
        from eagle_tpu.utils.profiling import StageTimer

        timer = StageTimer()
    if args.segment_frames > 0:
        # bounded-memory stream: decode, perceive, and post-process without
        # ever holding the full clip (frames re-decode lazily for the
        # team-assignment crops and the annotated render)
        fps = args.fps
        coordinates = {}
        for block in model.stream_coordinates(
            iter_video(args.video_path, fps, args.segment_frames),
            fps,
            num_homography=args.num_homography,
            num_keypoint_detection=args.num_keypoint_detection,
            calibration=args.calibration,
            verbose=True,
            profile=timer,
        ):
            coordinates.update(block)
        # the streamed pass just counted the true sampled frames; container
        # metadata can disagree, so pin the source's length to it
        frames = VideoFrameSource(args.video_path, fps, length=len(coordinates))
    else:
        frames, fps = read_video_array(args.video_path, args.fps)
        coordinates = model.get_coordinates(
            frames,
            fps,
            num_homography=args.num_homography,
            num_keypoint_detection=args.num_keypoint_detection,
            calibration=args.calibration,
            profile=timer,
        )
    if timer is not None:
        print(timer.report(), file=sys.stderr)

    with open(f"{root}/raw_coordinates.json", "w") as f:
        json.dump(coordinates, f, default=float)

    print("Processing Data")
    processor = Processor(coordinates, frames, fps, filter_ball_detections=False)
    df, team_mapping = processor.process_data(smooth=args.smooth)
    df.to_json(f"{root}/raw_data.json", orient="records")
    with open(f"{root}/metadata.json", "w") as f:
        json.dump({"fps": fps, "team_mapping": team_mapping}, f, default=str)

    processed_df = processor.format_data(df)
    processed_df.to_json(f"{root}/processed_data.json", orient="records")

    # lazily: the renderer re-decodes frames on demand in streamed mode.
    # Peek one frame so "nothing to render" is detected explicitly instead
    # of catching exceptions from the render/encode path.
    rendered = iter(render_annotated_frames(df, frames, coordinates, team_mapping))
    first = next(rendered, None)
    if first is None:
        print("No annotated frames to render (no detections); skipping annotated.mp4")
    else:
        write_video(
            itertools.chain([first], rendered), f"{root}/annotated.mp4", fps
        )
    print("Data saved to", root)


if __name__ == "__main__":
    main()
