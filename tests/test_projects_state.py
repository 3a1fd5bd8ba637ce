"""F16/F17/F18: cronjob ticks, on_finished, auto-pause FSM — state-machine
semantics mirroring /root/reference/tests/test_scheduler.py:741-869 (pause
transitions) and scheduler.py:419-449,541-561, quantized to rounds."""

from pyspider_spark.operators.projects import (
    FAIL_PAUSE_NUM,
    PAUSE_TIME,
    UNPAUSE_CHECK_NUM,
    ProjectsState,
)

T0 = 1_700_000_000.0


def test_pause_after_fail_streak():
    st = ProjectsState()
    st.ensure("p")
    assert not st.is_paused("p", T0)
    st.record_outcomes("p", [False] * FAIL_PAUSE_NUM)
    assert st.is_paused("p", T0 + 1)


def test_success_interrupts_streak():
    st = ProjectsState()
    st.record_outcomes("p", [False] * (FAIL_PAUSE_NUM - 1) + [True])
    st.record_outcomes("p", [False] * (FAIL_PAUSE_NUM - 1))
    assert not st.is_paused("p", T0)  # newest 9 fails, then a success


def test_unpause_check_cycle():
    st = ProjectsState()
    st.record_outcomes("p", [False] * FAIL_PAUSE_NUM)
    assert st.is_paused("p", T0)  # -> paused
    # after PAUSE_TIME: checking (not paused; a probe wave may run)
    assert not st.is_paused("p", T0 + PAUSE_TIME + 1)
    # probe outcomes all fail -> paused again
    st.record_outcomes("p", [False] * UNPAUSE_CHECK_NUM)
    assert st.is_paused("p", T0 + PAUSE_TIME + 2)
    # next checking window: one success -> unpaused
    assert not st.is_paused("p", T0 + 2 * (PAUSE_TIME + 2))  # -> checking
    st.record_outcomes("p", [False, True, False])
    assert not st.is_paused("p", T0 + 2 * PAUSE_TIME + 10)
    assert st.runtimes["p"].paused is False


def test_cronjob_ticks():
    st = ProjectsState()
    st.ensure("a", min_tick=2)
    st.ensure("b", min_tick=5)
    ticks = st.cronjob_ticks(T0 + 10, T0)
    a_ticks = [t for p, t in ticks if p == "a"]
    b_ticks = [t for p, t in ticks if p == "b"]
    assert a_ticks == [2, 4, 6, 8, 10]
    assert b_ticks == [5, 10]
    # advancing 1s later yields nothing new until the next multiple
    assert st.cronjob_ticks(T0 + 11, T0) == []
    assert st.cronjob_ticks(T0 + 12, T0) == [("a", 12)]


def test_on_finished_after_drain_wait():
    st = ProjectsState()
    assert not st.on_finished_due("p", selected=5, queue_size=10)
    fired = []
    for i in range(FAIL_PAUSE_NUM + 2):
        fired.append(st.on_finished_due("p", selected=0, queue_size=0))
    assert fired.count(True) == 1
    assert fired.index(True) == FAIL_PAUSE_NUM  # waits 10 idle rounds
    # does not re-fire while still drained
    assert not st.on_finished_due("p", selected=0, queue_size=0)
    # new activity re-arms it
    assert not st.on_finished_due("p", selected=3, queue_size=4)
    for i in range(FAIL_PAUSE_NUM):
        assert not st.on_finished_due("p", selected=0, queue_size=0)
    assert st.on_finished_due("p", selected=0, queue_size=0)


def test_min_tick_gcd_of_every_intervals():
    """VERDICT r03 item 6: min_tick derives as the GCD of the project's
    @every intervals (base_handler.py:100-119), explicit min_tick wins."""
    from pyspider_spark.operators.projects import min_tick_of

    assert min_tick_of({"every": [30, 45]}) == 15
    assert min_tick_of({"every": [60]}) == 60
    assert min_tick_of({"every": [7, 11]}) == 1
    assert min_tick_of({}) == 0
    assert min_tick_of({"every": []}) == 0
    assert min_tick_of({"min_tick": 4, "every": [30, 45]}) == 4  # explicit wins

    # dispatch times follow the derived tick like the reference's
    # _on_cronjob cadence: multiples of gcd(30,45)=15
    st = ProjectsState()
    st.ensure("p", min_tick=min_tick_of({"every": [30, 45]}))
    ticks = [t for _, t in st.cronjob_ticks(T0 + 100, T0)]
    assert ticks == [15, 30, 45, 60, 75, 90]
