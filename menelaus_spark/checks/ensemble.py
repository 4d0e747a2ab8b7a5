"""Ensembles + election schemes over detector states.

Elections reproduce /root/reference/menelaus/ensemble/election.py:9-201
(SimpleMajority :29-52, MinimumApproval :55-83, OrderedApproval
:86-138, Confirmed :141-201). They operate on plain drift-state strings
-- in our engine those come from verdict rows, so the same reducers work
over a verdicts DataFrame grouped by partition.

The ensemble mirrors /root/reference/menelaus/ensemble/ensemble.py:11-245:
``update`` fans the batch out to every member detector (each seeing its
configured column projection, :22-33, 48) and the election reduces the
member states into the ensemble state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class SimpleMajorityElection:
    def __call__(self, states: list[str | None]) -> str | None:
        return "drift" if sum(s == "drift" for s in states) > len(states) // 2 else None


class MinimumApprovalElection:
    def __init__(self, approvals_needed: int = 1):
        self.approvals_needed = approvals_needed

    def __call__(self, states: list[str | None]) -> str | None:
        n = 0
        for s in states:
            if s == "drift":
                n += 1
            if n >= self.approvals_needed:
                return "drift"
        return None


class OrderedApprovalElection:
    def __init__(self, approvals_needed: int = 1, confirmations_needed: int = 1):
        self.approvals_needed = approvals_needed
        self.confirmations_needed = confirmations_needed

    def __call__(self, states: list[str | None]) -> str | None:
        approvals = confirmations = 0
        for s in states:
            if s == "drift":
                if approvals < self.approvals_needed:
                    approvals += 1
                else:
                    confirmations += 1
                if (approvals >= self.approvals_needed
                        and confirmations >= self.confirmations_needed):
                    return "drift"
        return None


class ConfirmedElection:
    """Stateful: a detector's alarm keeps counting as an alarm for
    ``wait_time`` subsequent steps, so near-coincident alarms across
    detectors confirm each other (election.py:141-201)."""

    def __init__(self, sensitivity: int, wait_time: int):
        self.sensitivity = sensitivity
        self.wait_time = wait_time
        self.wait_period_counters: list[int] | None = None

    def __call__(self, states: list[str | None]) -> str | None:
        if self.wait_period_counters is None:
            self.wait_period_counters = [0] * len(states)
        num_drift = num_warning = 0
        for i, s in enumerate(states):
            if s == "drift" and self.wait_period_counters[i] == 0:
                num_drift += 1
                self.wait_period_counters[i] += 1
            elif s == "warning":
                num_warning += 1
            elif self.wait_period_counters[i] != 0:
                num_drift += 1
                self.wait_period_counters[i] += 1
        if num_drift >= self.sensitivity:
            ret = "drift"
        elif num_warning + num_drift >= self.sensitivity:
            ret = "warning"
        else:
            ret = None
        for i, c in enumerate(self.wait_period_counters):
            if c > self.wait_time:
                self.wait_period_counters[i] = 0
        return ret


class StreamingEnsemble:
    """Fan each sample out to member streaming kernels, reduce with an
    election (reference menelaus/ensemble/ensemble.py:88-158).

    ``column_selectors`` maps member name -> callable taking the
    sample's feature payload and returning what that member's
    ``update`` expects (reference :22-33 uses X-projection functions).
    Members with (y_true, y_pred) update signatures (DDM/EDDM/STEPD/
    LFR) receive the labels instead, as the reference's uniform
    ``update(X, y_true, y_pred)`` does.

    Sequential by design: streaming kernels are order-dependent
    recurrences, so the ensemble is driver-side state; distributed use
    goes through the trace layer / foreachBatch like the individual
    kernels.
    """

    def __init__(self, detectors: dict[str, object], election,
                 column_selectors: dict | None = None):
        self.detectors = dict(detectors)
        self.election = election
        self.column_selectors = column_selectors or {}
        self.drift_state: str | None = None
        self.total_samples = 0
        self.samples_since_reset = 0
        # classify members ONCE — inspect.signature per sample would be
        # O(samples x members) reflection inside the per-row hot loop
        # that also runs in the distributed trace kernels
        self._labeled = {
            name: self._wants_labels(det) for name, det in self.detectors.items()
        }

    @staticmethod
    def _wants_labels(det) -> bool:
        import inspect

        params = [
            p for p in inspect.signature(det.update).parameters if p != "self"
        ]
        return params[:2] == ["y_true", "y_pred"]

    def update(self, x=None, y_true=None, y_pred=None) -> str | None:
        for name, det in self.detectors.items():
            if self._labeled[name]:
                det.update(y_true, y_pred)
            else:
                sel = self.column_selectors.get(name)
                det.update(sel(x) if sel is not None else x)
        self.drift_state = self.election(
            [det.drift_state for det in self.detectors.values()]
        )
        self.total_samples += 1
        self.samples_since_reset += 1
        return self.drift_state

    def reset(self) -> None:
        """Reset ensemble and member drift state; ``total_samples``
        survives, as in the reference (test_ensemble.py:92-98)."""
        self.samples_since_reset = 0
        self.drift_state = None
        for det in self.detectors.values():
            det.reset()

    def snapshot(self) -> tuple[float, float]:
        """(members currently alarming, nan) — lets the ensemble plug
        into the per-group trace machinery like any single kernel."""
        n = sum(det.drift_state == "drift" for det in self.detectors.values())
        return float(n), float("nan")

    @property
    def drift_states(self) -> dict[str, str | None]:
        return {name: det.drift_state for name, det in self.detectors.items()}

    @property
    def retraining_recs(self) -> dict:
        """Member retraining recommendations; members without the
        attribute are skipped (ensemble.py:76-87)."""
        return {
            name: det.retraining_recs
            for name, det in self.detectors.items()
            if hasattr(det, "retraining_recs")
        }


class BatchEnsemble:
    """Fan a batch out to member batch detectors, reduce with an
    election. ``column_selectors`` maps member name -> list of columns
    to project before update (None = all)."""

    def __init__(self, detectors: dict[str, object], election,
                 column_selectors: dict[str, list[str]] | None = None):
        self.detectors = detectors
        self.election = election
        self.column_selectors = column_selectors or {}
        self.drift_state: str | None = None
        self.total_batches = 0

    def _project(self, name: str, df: DataFrame) -> DataFrame:
        cols = self.column_selectors.get(name)
        return df.select(*cols) if cols else df

    def set_reference(self, df: DataFrame) -> None:
        for name, det in self.detectors.items():
            det.set_reference(self._project(name, df))

    def update(self, df: DataFrame) -> str | None:
        self.total_batches += 1
        states = []
        for name, det in self.detectors.items():
            states.append(det.update(self._project(name, df)))
        self.drift_state = self.election(states)
        return self.drift_state

    def member_states(self) -> dict[str, str | None]:
        return {name: det.drift_state for name, det in self.detectors.items()}
