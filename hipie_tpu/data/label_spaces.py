"""Builtin label spaces (public category lists) for demos and evaluation.

Replaces the reference's openseg_labels/*.txt data files for the most-used
benchmarks; arbitrary label sets still load via datasets.load_openseg_labels.
"""

COCO_80 = [
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella", "handbag",
    "tie", "suitcase", "frisbee", "skis", "snowboard", "sports ball", "kite",
    "baseball bat", "baseball glove", "skateboard", "surfboard",
    "tennis racket", "bottle", "wine glass", "cup", "fork", "knife", "spoon",
    "bowl", "banana", "apple", "sandwich", "orange", "broccoli", "carrot",
    "hot dog", "pizza", "donut", "cake", "chair", "couch", "potted plant",
    "bed", "dining table", "toilet", "tv", "laptop", "mouse", "remote",
    "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
    "refrigerator", "book", "clock", "vase", "scissors", "teddy bear",
    "hair drier", "toothbrush",
]

COCO_PANOPTIC_STUFF_53 = [
    "banner", "blanket", "bridge", "cardboard", "counter", "curtain",
    "door-stuff", "floor-wood", "flower", "fruit", "gravel", "house", "light",
    "mirror-stuff", "net", "pillow", "platform", "playingfield", "railroad",
    "river", "road", "roof", "sand", "sea", "shelf", "snow", "stairs", "tent",
    "towel", "wall-brick", "wall-stone", "wall-tile", "wall-wood",
    "water-other", "window-blind", "window-other", "tree-merged",
    "fence-merged", "ceiling-merged", "sky-other-merged", "cabinet-merged",
    "table-merged", "floor-other-merged", "pavement-merged", "mountain-merged",
    "grass-merged", "dirt-merged", "paper-merged", "food-other-merged",
    "building-other-merged", "rock-merged", "wall-other-merged", "rug-merged",
]

# COCO panoptic 133 = 80 things + 53 stuff.
COCO_PANOPTIC_133 = COCO_80 + COCO_PANOPTIC_STUFF_53
COCO_PANOPTIC_IS_THING = [True] * 80 + [False] * 53

PASCAL_VOC_21 = [
    "background", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]

# Pascal-Panoptic-Parts part vocabulary used by the hierarchical demo
# (reference notebooks/Demo-Main.ipynb part label set).
PASCAL_PARTS = [
    "head", "torso", "arm", "hand", "leg", "foot", "tail", "wing", "beak",
    "horn", "ear", "eye", "nose", "mouth", "hair", "neck", "wheel", "door",
    "window", "headlight", "mirror", "engine", "body", "handlebar", "saddle",
    "plant", "pot", "screen", "frame", "coach",
]

# object words shared across part labels ("dog head"/"dog tail"), used by the
# part-mode positive-map spreading (coco_dataset_mapper_uni.py
# THINGS_CLASSES_WITH_PART).
THINGS_CLASSES_WITH_PART = [
    "person", "dog", "cat", "bird", "cow", "horse", "sheep", "aeroplane",
    "bicycle", "motorbike", "car", "bus", "train", "bottle", "pottedplant",
    "tvmonitor",
]
