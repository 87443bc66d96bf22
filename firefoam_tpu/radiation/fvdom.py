"""fvDOM discrete-ordinates radiation (batched-ray TPU formulation).

Full implementation lands with the radiation milestone; FvDOM.try_from_case
returns None until then so the solver uses the optically-thin radiant-
fraction fallback.
"""


class FvDOM:
    @classmethod
    def try_from_case(cls, case_dir):
        return None
