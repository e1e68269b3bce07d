"""CAPability — fine-grained caption-correctness benchmark (13 dimensions).

The model writes a detailed caption for an image or video; a judge then
checks one annotated fact per doc (an event, an action, an object count, a
camera movement, ...) against the caption and scores it 1 (described
correctly), 0 (not mentioned), or -1 (described wrongly).  Per-dimension
results aggregate to precision (correct/hit), recall (correct/all),
hit_rate, and F1.

Reference sources (byte-parity tested in tests/test_capability.py):
  - lmms-eval/lmms_eval/tasks/capability/_default_template_yaml — the
    image/video caption prompts and judge-eval metadata.
  - lmms-eval/lmms_eval/tasks/capability/prompt.py — per-dimension judge
    system/user prompts (``Prompts.get_prompts_by_task``).
  - lmms-eval/lmms_eval/tasks/capability/utils.py — response parsing
    (``call_and_parse_single_meaasge`` :461-476), per-dimension format
    validation + scoring (``post_validate_format_* / post_process_*``
    :202-421), and metrics (``calculate_metric`` :576-592).

Reference behaviors preserved exactly, including the failure paths: a judge
response that fails literal_eval or format validation is dropped from the
aggregate (the reference retries then tolerates missing records); the
``camera_angle``/``camera_movement`` validators call ``.split`` on the pred
*list* when an item arrives as a category-explain string (an AttributeError
in the reference — such records are ungraded), and only ``style``
normalizes those items; the ``dynamic_object_number`` validator consults
the outer response dict for the dict-typed branch (a KeyError in the
reference — ungraded).  Docs carry ``data_type`` ("image" | "video"),
``file_path``, ``task`` and ``annotation`` like the HF dataset
(lntzm/CAPability); image docs are served as single-frame media by this
harness.
"""

from __future__ import annotations

import ast
import logging
import os

from .llm_judge import JudgeConfig, JudgeProvider, create_provider
from .tasks import TASK_REGISTRY, BenchmarkTask

logger = logging.getLogger(__name__)

# ---------------------------------------------------------------------------
# captioning prompts (_default_template_yaml lmms_eval_specific_kwargs)
# ---------------------------------------------------------------------------

IMAGE_PROMPT = (
    "Please describe the image in detail. Your description should follow "
    "these rules:\na) You should describe each object in the image in "
    "detail, including its name, number, color, and spatial relationship "
    "between objects.\nb) You should describe the scene of the image.\nc) "
    "You should describe the camera angle when shooting this image, such as "
    "level angle, high angle, low angle, or dutch angle.\nd) You should "
    "describe the style of the image, such as realistic, animated, "
    "special-effect, old-fashioned and so on.\ne) If there are any texts in "
    "the image, you should describe the text content.\nf) If you know the "
    "character in the image, you should tell his or her name.\nDirectly "
    "output your detailed description in a elaborate paragraph, instead of "
    "itemizing them in list form. Your description: ")

VIDEO_PROMPT = (
    "Please describe the video in detail. Your description should follow "
    "these rules:\na) You should describe each events in the video in "
    "order, especially focusing on the behavior and action of characters, "
    "including people, animals.\nb) You should describe each object in the "
    "video in detail, including its name, number, color, and spatial "
    "relationship between objects.\nc) You should describe the scene of the "
    "video.\nd) You should describe the camera movement when shooting this "
    "video, especially the direction, such as pan left, track right, tilt "
    "up, boom down, zoom in, dolly out, and so on.\ne) You should describe "
    "the style of the video, such as realistic, animated, special-effect, "
    "old-fashioned and so on.\nf) If there are any texts in the video, you "
    "should describe the text content.\ng) If you know the character in the "
    "video, you should tell his or her name.\nDirectly output your detailed "
    "description in a elaborate paragraph, instead of itemizing them in "
    "list form. Your description: ")

# ---------------------------------------------------------------------------
# judge prompts (prompt.py::Prompts) — byte-exact
# ---------------------------------------------------------------------------

_TAIL = ("DO NOT PROVIDE ANY OTHER OUTPUT TEXT OR EXPLANATION. Only output "
         "the JSON. Do not add Markdown syntax. Output:")

_SYS_VIDEO_CAP = ("You are a video analysis expert specializing in "
                  "evaluating the accuracy of video captions, particularly "
                  "the descriptions of ")
_SYS_IMAGE_CAP = ("You are an image analysis expert specializing in "
                  "evaluating the accuracy of image captions, particularly "
                  "the descriptions of ")
_SYS_COMPARE = ("Please carefully analyze the user-provided caption, "
                "compare it to ")

SYSTEM_PROMPTS = {
    "event": (_SYS_VIDEO_CAP + "the events in a video. Please carefully "
              "analyze the user-provided caption and compare it to each "
              "provided event. Determine whether the caption contains the "
              "event."),
    "action": (_SYS_VIDEO_CAP + "actions in a video. " + _SYS_COMPARE +
               "the provided action and complete the task."),
    "object_category": (_SYS_IMAGE_CAP + "objects in an image. " +
                        _SYS_COMPARE +
                        "the provided object and complete the task."),
    "object_color": (_SYS_IMAGE_CAP + "the color of objects in an image. " +
                     _SYS_COMPARE +
                     "the provided object color and complete the task."),
    "object_number": (_SYS_IMAGE_CAP + "the number of objects in an image. "
                      + _SYS_COMPARE +
                      "the provided object number and complete the task."),
    "dynamic_object_number": (_SYS_VIDEO_CAP + "the number of objects in a "
                              "video. " + _SYS_COMPARE + "the provided "
                              "object number and complete the task."),
    "spatial_relation": (_SYS_IMAGE_CAP + "the spatial relationship between "
                         "objects in an image. " + _SYS_COMPARE +
                         "the provided spatial relationship between objects "
                         "and complete the task."),
    "scene": (_SYS_IMAGE_CAP + "the scene in an image. " + _SYS_COMPARE +
              "the provided scene and complete the task."),
    "camera_angle": (_SYS_IMAGE_CAP + "camera angle in an image. Please "
                     "carefully analyze the user-provided caption and "
                     "complete the classification task."),
    "camera_movement": (_SYS_VIDEO_CAP + "camera movements in the videos. "
                        "Please carefully analyze the user-provided caption "
                        "and complete the classification task."),
    "OCR": (_SYS_IMAGE_CAP + "the OCR texts in an image. " + _SYS_COMPARE +
            "the provided OCR texts and complete the task."),
    "style": (_SYS_IMAGE_CAP + "the image style. Please carefully analyze "
              "the user-provided caption and complete the classification "
              "task."),
    "character_identification": (_SYS_IMAGE_CAP + "person/character "
                                 "identification in an image. Please "
                                 "carefully analyze the user-provided "
                                 "caption, compare it to each provided name "
                                 "of the person/character and complete the "
                                 "task."),
}

DIMENSIONS = tuple(SYSTEM_PROMPTS)

CAMERA_ANGLE_EXPLAINS = [
    "level angle: Horizontal shooting of the subject (flat shot)",
    "high angle: Shooting from above the subject (overhead shot)",
    "low angle: Shooting from below the subject (upward shot)",
    "dutch angle: The lens has a certain angle of deflection along the "
    "central axis, making the horizon crooked",
]
CAMERA_ANGLE_CATEGORIES = [c.split(":")[0] for c in CAMERA_ANGLE_EXPLAINS]

CAMERA_MOVEMENT_EXPLAINS = [
    "left: the camera angle swings left (pan left), or the camera moves "
    "left (track left)",
    "right: the camera angle swings right (pan right), or the camera moves "
    "right (track right)",
    "up: the camera angle swings up (tilt up), or the camera moves up "
    "(boom up)",
    "down: the camera angle swings down (tilt down), or the camera moves "
    "down (boom down)",
    "in: camera pushes toward the subject (dolly in), or enlarges the frame "
    "(zoom in)",
    "out: camera moves away the subject (dolly out), or expands the visible "
    "area, makeing the subject appear smaller (zoom out)",
    "fixed: camera is almost fixed and does not change",
]
CAMERA_MOVEMENT_CATEGORIES = [c.split(":")[0]
                              for c in CAMERA_MOVEMENT_EXPLAINS]

STYLE_EXPLAINS = [
    "realistic: Represents subjects truthfully with lifelike detail and "
    "accuracy.",
    "animated: Created using 2D images or 3D computer-generated imagery "
    "(CGI), e.g., cartoon, anime",
    "special effect: Creates illusions through practical or digital "
    "techniques to enhance visuals.",
    "old-fashioned: Emulates historical aesthetics like vintage or "
    "classical artistic styles.",
    "pixel art: Retro digital art using blocky pixels for a nostalgic, "
    "low-res look.",
    "sketch art: Rough, expressive drawings emphasizing line work and "
    "spontaneity.",
    "abstract art: Non-representational art focused on shapes, colors, and "
    "emotions over realism.",
    "impressionism art: Captures fleeting light/moments with visible "
    "brushstrokes and vibrant color dabs.",
    "cubism art: Depicts subjects through fragmented geometric planes and "
    "multiple perspectives.",
]
STYLE_CATEGORIES = [c.split(":")[0] for c in STYLE_EXPLAINS]

_SCORE_JSON = {
    "event": '{"event": "copy provided event here", ',
    "action": '{"action": "copy provided action here", ',
    "object_category": '{"object_category": "copy provided object here", ',
    "object_number": ('{"object_number": "copy the provided '
                      '{object: number} here", '),
    "object_color": ('{"object_color": "copy the provided '
                     '{object: color} here", '),
    "spatial_relation": ('{"spatial_relation": "copy the provided spatial '
                         'relationship here", '),
    "scene": '{"scene": "copy the provided scene here", ',
    "character_identification": '{"character_identification": '
                                '"copy the provided name here", ',
}


def _score_json_line(dim: str) -> str:
    return (_SCORE_JSON[dim] + '"score": "put your score here",  '
            '"reason": "give your reason here"}\n')


_PRED_JSON_LINE = ('{"pred": "put your predicted category as a python list '
                   'here", "reason": "give your reason here"}\n')


def judge_prompts(dim: str, caption: str, anno):
    """(system_prompt, user_prompt | [user_prompt...]) for one doc —
    byte-equal to prompt.py::Prompts.get_prompts_by_task."""
    system = SYSTEM_PROMPTS[dim]
    if dim == "event":
        user = (
            "Given a video caption and an event as follows:\n"
            f"Video Caption: {caption}\n"
            f"Event: {anno}\n"
            "Please analyze the video caption. Determine whether the "
            "provided event is described in the caption, and explain why. "
            "Note it can be considered mentioned as long as the caption "
            "contains an expression with a similar meaning to the event "
            "provided.\n"
            "Give score of 0 if the caption is totally irrelative to the "
            "provided event. Give score of 1 if the caption mentions the "
            "provided event correctly. Give score of -1 if the caption "
            "mentions the relative event give a wrong description.\n"
            "Output a JSON formed as:\n" + _score_json_line(dim) + _TAIL)
    elif dim == "action":
        user = (
            "Given a video caption and an action as follows:\n"
            f"Video Caption: {caption}\n"
            f"Action: {anno}\n"
            "Please analyze the video caption. Determine whether the "
            "provided action is mentioned in the caption, and explain why. "
            "Note it can be considered mentioned as long as the caption "
            "contains an expression with a similar meaning to the action "
            "provided.\n"
            "Give score of 0 if the caption does not mention ANY actions "
            "(including the provided action and any other action "
            "description). Give score of 1 if the caption mentions the "
            "provided action. Give score of -1 if the provided action is "
            "not mentioned in the caption.\n"
            "Output a JSON formed as:\n" + _score_json_line(dim) + _TAIL)
    elif dim == "object_category":
        user = (
            "Given an image caption and an object as follows:\n"
            f"Image Caption: {caption}\n"
            f"Object: {anno}\n"
            "Please analyze the image caption. Determine whether the "
            "provided object is mentioned in the caption, and explain why. "
            "Note it can be considered mentioned as long as the caption "
            "contains an expression with a similar meaning to the object "
            "provided.\n"
            "Give score of 0 if the caption does not mention ANY objects "
            "(including the provided object and any other objects). Give "
            "score of 1 if the caption mentions the provided object. Give "
            "score of -1 if the object is not mentioned in the caption.\n"
            "Output a JSON formed as:\n" + _score_json_line(dim) + _TAIL)
    elif dim == "object_number":
        cat, num = list(anno.items())[0]
        user = (
            "Given an image caption and the number of an object with format "
            "{object: number} as follows:\n"
            f"Image Caption: {caption}\n"
            f"Object Number: {{{cat}: {num}}}\n"
            "Please analyze the image caption. Determine whether the "
            "provided object number is correctly described in the caption, "
            "and explain why. You may need to count in the caption to "
            "determine how many the provided objects it describes.\n"
            "Give score of 0 if the caption does not mention the specific "
            "number of provided object (including the use of words such as "
            "'some' and 'various' in the caption rather than giving "
            "specific numbers) or not mention the provided object. Give "
            "score of 1 if the caption counts the provided object "
            "correctly. Give score only of -1 if the caption counts the "
            "wrong number of the provided object.\n"
            "Output a JSON formed as:\n" + _score_json_line(dim) + _TAIL)
    elif dim == "dynamic_object_number":
        user = []
        for cat, num in anno.items():
            user.append(
                "Given a video caption and the number of an object with "
                "format {object: number} as follows:\n"
                f"Image Caption: {caption}\n"
                f"Object Number: {{{cat}: {num}}}\n"
                "Please analyze the video caption. Determine whether the "
                "provided object number is correctly described in the "
                "caption, and explain why. You may need to count in the "
                "caption to determine how many the provided objects it "
                "describes. Note you can never infer the number if the "
                "caption only gives 'some', 'several' without specific "
                "numbers.\n"
                "Give score of 0 if the caption does not mention the "
                "specific number of provided object (including the use of "
                "words such as 'some' and 'various' in the caption rather "
                "than giving specific numbers) or not mention the provided "
                "object. Give score of 1 if the caption counts the provided "
                "object correctly. Give score only of -1 if the caption "
                "counts the wrong number of the provided object.\n"
                "Output a JSON formed as:\n"
                '{"object_number": "copy the provided {object: number} '
                'here", "score": "put your score here",  "reason": "give '
                'your reason here"}\n' + _TAIL)
    elif dim == "object_color":
        cat, color = list(anno.items())[0]
        user = (
            "Given an image caption and the color of an object with format "
            "{object: color} as follows:\n"
            f"Image Caption: {caption}\n"
            f"Object Color: {{{cat}: {color}}}\n"
            "Please analyze the image caption. Determine whether the "
            "provided object color is correctly described in the caption, "
            "and explain why.\n"
            "Give score of 0 for the following two situations:\n"
            "1) The provided object is not mentioned in the caption. Note "
            "it can be considered mentioned as long as the caption contains "
            "an expression with a similar meaning to the object provided.\n"
            "2) The caption does not mention the specific color of provided "
            "object\n"
            "Give score of 1 if the caption describes the object color "
            "correctly. Give score of -1 only if the caption gives the "
            "wrong color. Note it can be considered correct if the caption "
            "contains an expression with a similar meaning to the provided "
            "color.\n"
            "Output a JSON formed as:\n" + _score_json_line(dim) + _TAIL)
    elif dim == "spatial_relation":
        user = (
            "Given an image caption and the spatial relationship between "
            "two objects as follows:\n"
            f"Image Caption: {caption}\n"
            f"Spatial Relationship: {anno}\n"
            "Please analyze the image caption. Determine whether the "
            "provided spatial relationship is correctly decribed in "
            "caption, and explain why.\n"
            "Give score of 0 if the caption does not mention the spatial "
            "relationship between objects or not mention the objects. Give "
            "score of 1 if the caption describes the spatial relationship "
            "correctly. Give score of -1 only if the caption describes the "
            "wrong spatial relationship.\n"
            "Output a JSON formed as:\n" + _score_json_line(dim) + _TAIL)
    elif dim == "scene":
        user = (
            "Given an image caption and a scene as follows:\n"
            f"Image Caption: {caption}\n"
            f"Scene: {anno}\n"
            "Please analyze the image caption. Determine whether the "
            "provided scene is included in the caption, and explain why.\n"
            "Give score of 0 if the caption does not mention ANY scene "
            "information (including the provided scene and any other "
            "scenes). Give score of 1 if the caption mentions the provided "
            "scene. Give score of -1 only if the scene is not mentioned in "
            "the caption.\n"
            "Output a JSON formed as:\n" + _score_json_line(dim) + _TAIL)
    elif dim == "camera_angle":
        user = (
            "Given an image caption, your task is to determine which kind "
            "of camera angles is included in the caption.\n"
            f"Image Caption: {caption}\n"
            "Please analyze the image caption and classify the descriptions "
            "of camera angles into the following categories: "
            f"{CAMERA_ANGLE_CATEGORIES}\n"
            "Here are the explanations of each category: "
            + "\n".join(CAMERA_ANGLE_EXPLAINS) + "\n"
            "If the caption explicitly mentions one or some of the above "
            "camera angle categories, write the result of the categories "
            "with a python list format into the 'pred' value of the json "
            "string. You should only search the descriptions about the "
            "camera angle. If there is no description of the camera angle "
            "in the image caption or the description does not belong to any "
            "of the above categories, write 'N/A' into the 'pred' value of "
            "the json string.\n"
            "Output a JSON formed as:\n" + _PRED_JSON_LINE + _TAIL)
    elif dim == "camera_movement":
        user = (
            "Given a video caption, your task is to determine which kind of "
            "camera movement is included in the caption.\n"
            f"Video Caption: {caption}\n"
            "Please analyze the video caption and classify the descriptions "
            "of camera movement into the following categories: "
            f"{CAMERA_MOVEMENT_CATEGORIES}\n"
            "Here are the explanations of each category: "
            + "\n".join(CAMERA_MOVEMENT_EXPLAINS) + "\n"
            "If the caption explicitly mentions one or some of the above "
            "camera movement categories, write the result of the categories "
            "with a python list format into the 'pred' value of the json "
            "string. Note do not infer the camera movement categories from "
            "the whole caption. You should only search the descriptions "
            "about the camera movement. If there is no description of the "
            "camera movement in the video caption or the description does "
            "not belong to any of the above categories, write 'N/A' into "
            "the 'pred' value of the json string.\n"
            "Output a JSON formed as:\n" + _PRED_JSON_LINE + _TAIL)
    elif dim == "OCR":
        user = (
            "Given an image caption and an OCR text as follows:\n"
            f"Image Caption: {caption}\n"
            f"OCR Text: {anno}\n"
            "Please analyze the image caption. Determine whether the "
            "provided text is described correctly in the caption, and "
            "explain why.\n"
            "Give score of 0 if there is no description about the provided "
            "OCR text in the caption. Give score of 1 if the caption refers "
            "the text and recognizes correctly. Give score of -1 if the "
            "recognization result is wrong in the caption.\n"
            "Output a JSON formed as:\n"
            '{"OCR": "copy the provided real OCR text here", "score": put '
            'your score here, "reason": "give your reason here"},\n' + _TAIL)
    elif dim == "style":
        user = (
            "Given an image caption, your task is to determine which "
            "category of image style is included in the caption.\n"
            f"Image Caption: {caption}\n"
            "Please analyze the image caption and classify the descriptions "
            "of the image style into the following categories: "
            f"{STYLE_CATEGORIES}\n"
            "Here are the explanations of each category: "
            + "\n".join(STYLE_EXPLAINS) + "\n"
            "If the description of the image style belongs to one or some "
            "of the above categories, write the result of the categories "
            "with a python list format into the 'pred' value of the json "
            "string. Focus more on the artistic style part in the caption. "
            "If there is no description of the image style in the image "
            "caption or the description does not belong to any of the above "
            "categories, write 'N/A' into the 'pred' value of the json "
            "string.\n"
            "Output a JSON formed as:\n" + _PRED_JSON_LINE + _TAIL)
    elif dim == "character_identification":
        user = (
            "Given an image caption and the name of a person/character as "
            "follows:\n"
            f"Image Caption: {caption}\n"
            f"name: {anno}\n"
            "Please analyze the image caption. Determine whether the "
            "provided name of person/character is included in the caption, "
            "and explain why.\n"
            "Give score of 0 if the caption does not mention any names. "
            "Give score of 1 if the caption mentions the provided name "
            "correctly. Give score of -1 if the name in the caption gives a "
            "wrong name.\n"
            "Output a JSON formed as:\n" + _score_json_line(dim) + _TAIL)
    else:
        raise ValueError(f"Wrong task type: {dim}")
    return system, user


# ---------------------------------------------------------------------------
# response parsing + per-dimension validation/scoring (utils.py semantics)
# ---------------------------------------------------------------------------

def parse_judge_response(text: str):
    """Markdown-fence stripping + literal_eval — utils.py:461-476.  Raises
    on unparseable content (the reference returns None and drops the
    record; callers here catch and mark the doc ungraded)."""
    if "```json" in text:
        text = text.split("```json")[-1].split("```")[0].strip()
    if "```python" in text:
        text = text.split("```python")[-1].split("```")[0].strip()
    elif "```" in text:
        text = text.split("```")[1].strip()
    return ast.literal_eval(text)


def _coerce_score(entry: dict) -> int:
    """utils.py score normalization: the strings '-1'/'0'/'1' coerce to int,
    anything outside {1, 0, -1} is a format failure."""
    if entry["score"] in ["-1", "0", "1"]:
        entry["score"] = int(entry["score"])
    if entry["score"] not in (1, 0, -1):
        raise ValueError(f"invalid score {entry['score']!r}")
    return entry["score"]


# dims whose judge response is {<key>: <copied anno>, score, reason}
_COPY_SCORE_KEY = {
    "event": "event", "action": "action",
    "object_category": "object_category",
    "spatial_relation": "spatial_relation", "scene": "scene",
    "OCR": "OCR", "character_identification": "character_identification",
}

_PRED_LIST_SPEC = {
    "camera_angle": (CAMERA_ANGLE_CATEGORIES, CAMERA_ANGLE_EXPLAINS),
    "camera_movement": (CAMERA_MOVEMENT_CATEGORIES,
                        CAMERA_MOVEMENT_EXPLAINS),
    "style": (STYLE_CATEGORIES, STYLE_EXPLAINS),
}


def _validate_object_entry(entry: dict, anno_value, strict: bool) -> None:
    """Shared {object: number|color} unpack — utils.py:238-76,314-35.
    Exactly two ':'-parts for numbers (more raise, like the reference
    unpack); colors re-join extra parts."""
    v = entry.get("object_number", entry.get("object_color"))
    key = "object_number" if "object_number" in entry else "object_color"
    if isinstance(v, str):
        if ":" not in v:
            raise ValueError(f"no ':' in {key}")
        parts = v.lstrip("{").rstrip("}").split(":")
        if key == "object_color" and len(parts) > 2:
            _cat, val = ":".join(parts[:-1]), parts[-1]
        else:
            _cat, val = parts  # >2 parts raise, as in the reference
        val = int(val.strip()) if key == "object_number" else val.strip()
    elif isinstance(v, dict):
        _cat, val = list(v.items())[0]
        # the reference calls .strip() on the dict value unconditionally —
        # an int value is an AttributeError there (record dropped); keep it
        val = int(val.strip()) if key == "object_number" else val.strip()
    else:
        raise ValueError(f"Invalid {key} format")
    if strict and val != list(anno_value.values())[0]:
        raise ValueError(f"{key} mismatch vs annotation")


def _validate_pred_list(dim: str, response: dict) -> None:
    """camera_angle/camera_movement/style pred normalization —
    utils.py:337-56,364-83,396-414."""
    categories, explains = _PRED_LIST_SPEC[dim]
    if "pred" not in response:
        raise ValueError("no pred")
    if response["pred"] == "N/A" or "N/A" in response["pred"]:
        response["pred"] = ["N/A"]
    if isinstance(response["pred"], str):
        response["pred"] = ast.literal_eval(response["pred"])
    if not isinstance(response["pred"], list):
        raise ValueError("pred is not a list")
    for i in range(len(response["pred"])):
        if response["pred"][i] in explains:
            if dim == "style":
                response["pred"][i] = \
                    response["pred"][i].split(":")[0].lower()
            else:
                # reference bug kept: camera_* call .split on the LIST —
                # AttributeError, so these records end up ungraded
                response["pred"][i] = response["pred"].split(":")[0].lower()
        if response["pred"][i] != "N/A" and \
                response["pred"][i] not in categories:
            raise ValueError(f"pred {response['pred'][i]!r} not a category")


def validate_and_score(dim: str, response, anno, strict: bool = False):
    """post_validate_format_<dim> + post_process_<dim> — utils.py:202-421.

    Returns the int score (or score list for dynamic_object_number); raises
    on any format violation, which marks the record ungraded exactly like
    the reference's dropped-response path."""
    if not isinstance(response, dict):
        raise ValueError("response is not a dict")
    if dim in _COPY_SCORE_KEY:
        if strict and response[_COPY_SCORE_KEY[dim]].strip() != anno.strip():
            raise ValueError(f"{dim} copy mismatch")
        return _coerce_score(response)
    if dim in ("object_number", "object_color"):
        _validate_object_entry(response, anno, strict)
        return _coerce_score(response)
    if dim in _PRED_LIST_SPEC:
        _validate_pred_list(dim, response)
        if len(response["pred"]) == 1 and response["pred"][0] == "N/A":
            return 0
        return 1 if anno in response["pred"] else -1
    if dim == "dynamic_object_number":
        if "response" not in response:
            raise ValueError("no response list")
        anno_values = list(anno.values())
        for i, r in enumerate(response["response"]):
            v = r["object_number"]
            if isinstance(v, str):
                if ":" not in v:
                    raise ValueError("no ':' in object_number")
                _cat, num = v.lstrip("{").rstrip("}").split(":")
                num = int(num.strip())
            elif isinstance(response["object_number"], dict):
                # reference bug kept: consults the OUTER dict (KeyError on
                # the line above for dict-typed items) — record ungraded
                _cat, num = list(r["object_number"].items())[0]
                num = int(num.strip())
            else:
                raise ValueError("Invalid object_number format")
            if strict and num != anno_values[i]:
                raise ValueError("object_number mismatch vs annotation")
            _coerce_score(r)
        return [r["score"] for r in response["response"]]
    raise ValueError(f"Wrong task type: {dim}")


def capability_metrics(all_scores: list) -> dict:
    """calculate_metric — utils.py:576-592.  precision = correct/hit,
    recall = correct/all, both ×100; F1 from those."""
    sum_count = len(all_scores)
    hit_count = sum(s != 0 for s in all_scores)
    correct_count = sum(s == 1 for s in all_scores)
    precision = 0 if hit_count == 0 else 100 * correct_count / hit_count
    recall = 0 if sum_count == 0 else 100 * correct_count / sum_count
    hit_rate = 0 if sum_count == 0 else 100 * hit_count / sum_count
    f1_score = 0 if precision == 0 else \
        2 * precision * recall / (precision + recall)
    return {"precision": precision, "recall": recall, "hit_rate": hit_rate,
            "f1_score": f1_score}


# ---------------------------------------------------------------------------
# task wiring
# ---------------------------------------------------------------------------

def capability_doc_to_text(doc, lmms_eval_specific_kwargs=None) -> str:
    kw = {"image_prompt": IMAGE_PROMPT, "video_prompt": VIDEO_PROMPT}
    if lmms_eval_specific_kwargs:
        kw.update(lmms_eval_specific_kwargs)
    return kw[f"{doc.get('data_type', 'video')}_prompt"]


def _clean_annotation(doc):
    anno = doc["annotation"]
    if isinstance(anno, dict):
        anno = {k: v for k, v in anno.items() if v is not None}
    return anno


def _default_judge() -> JudgeProvider:
    # metadata.eval_model_name in _default_template_yaml
    return create_provider(config=JudgeConfig(
        model_name=os.environ.get("MODEL_VERSION", "gpt-4.1-2025-04-14"),
        max_tokens=512))


def make_capability_task(dim: str,
                         judge: JudgeProvider | None = None,
                         strict: bool = False) -> BenchmarkTask:
    if dim not in DIMENSIONS:
        raise ValueError(f"unknown CAPability dimension {dim!r}")
    if judge is None:
        judge = _default_judge()

    def process(doc, response, rng=None) -> dict:
        anno = _clean_annotation(doc)
        caption = response.strip()
        base = {"file_id": doc.get("file_id"), "task": dim,
                "caption": caption}
        system, user = judge_prompts(dim, caption, anno)
        try:
            if isinstance(user, list):
                parsed = {"response": []}
                for prompt in user:
                    res = judge._complete_with_retry(prompt,
                                                     system_prompt=system)
                    if not res.success:
                        raise RuntimeError(f"judge failed: {res.error}")
                    parsed["response"].append(
                        parse_judge_response(res.content))
            else:
                res = judge._complete_with_retry(user, system_prompt=system)
                if not res.success:
                    raise RuntimeError(f"judge failed: {res.error}")
                parsed = parse_judge_response(res.content)
            score = validate_and_score(dim, parsed, anno, strict=strict)
        except Exception as e:  # noqa: BLE001 — any format/judge failure
            logger.info("CAPability-%s grading failed for %s: %s",
                        dim, doc.get("file_id"), e)
            return {**base, "graded": False, "scores": []}
        scores = score if isinstance(score, list) else [score]
        return {**base, "graded": True, "scores": scores}

    def aggregate(results: list) -> dict:
        graded = [r for r in results if r["graded"]]
        metrics = capability_metrics(
            [s for r in graded for s in r["scores"]])
        metrics["ungraded"] = len(results) - len(graded)
        return metrics

    return BenchmarkTask(name=f"CAPability-{dim}",
                         doc_to_text=capability_doc_to_text,
                         process_response=process, aggregate=aggregate,
                         video_path_keys=("file_path", "video_path",
                                          "file_id"))


def register_capability(judge: JudgeProvider | None = None,
                        strict: bool = False) -> None:
    if judge is None:
        judge = _default_judge()
    for dim in DIMENSIONS:
        task = make_capability_task(dim, judge, strict=strict)
        TASK_REGISTRY[task.name] = task
