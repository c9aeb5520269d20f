"""Input manager — the reference's InputManager edge-detection semantics
(input/InputManager.h:11-334) without SDL.

The reference tracks every key/button through a per-frame state machine
Pressed -> Held -> Released -> None (input/InputManager.cpp:562-601). That
exact lifecycle is reproduced here over a programmatic event queue, so the
app shell works headless (tests, scripted benchmark runs) and from a TTY."""

from __future__ import annotations

import enum
from typing import Dict, Iterable, Set


class ButtonState(enum.Enum):
    NONE = 0
    PRESSED = 1   # went down this frame
    HELD = 2      # still down
    RELEASED = 3  # went up this frame


class InputManager:
    def __init__(self):
        self._keys: Dict[str, ButtonState] = {}
        self._pending_down: Set[str] = set()
        self._pending_up: Set[str] = set()

    # -- event feeding (the SDL_Event pump role) ---------------------------
    def feed_key_down(self, key: str) -> None:
        self._pending_down.add(key)

    def feed_key_up(self, key: str) -> None:
        self._pending_up.add(key)

    def feed_key_tap(self, key: str) -> None:
        """Down+up in one go: PRESSED on the next update, RELEASED on the
        one after (what a terminal keypress maps to)."""
        self._pending_down.add(key)
        self._pending_up.add(key)

    # -- per-frame update (InputManager::update lifecycle) ------------------
    def update(self) -> None:
        # advance last frame's edge states
        for k, st in list(self._keys.items()):
            if st == ButtonState.PRESSED:
                self._keys[k] = ButtonState.HELD
            elif st == ButtonState.RELEASED:
                self._keys[k] = ButtonState.NONE

        taps = self._pending_down & self._pending_up
        downs = self._pending_down - taps
        ups = self._pending_up - taps
        self._pending_down = set()
        self._pending_up = set()

        for k in downs:
            if self._keys.get(k, ButtonState.NONE) in (
                ButtonState.NONE, ButtonState.RELEASED,
            ):
                self._keys[k] = ButtonState.PRESSED
        for k in ups:
            if self._keys.get(k, ButtonState.NONE) in (
                ButtonState.PRESSED, ButtonState.HELD,
            ):
                self._keys[k] = ButtonState.RELEASED
        for k in taps:
            self._keys[k] = ButtonState.PRESSED
            self._pending_up.add(k)  # release lands next frame

    # -- queries (InputManager.h API shape) ---------------------------------
    def was_key_pressed(self, key: str) -> bool:
        return self._keys.get(key) == ButtonState.PRESSED

    def is_key_held(self, key: str) -> bool:
        return self._keys.get(key) in (ButtonState.PRESSED, ButtonState.HELD)

    def was_key_released(self, key: str) -> bool:
        return self._keys.get(key) == ButtonState.RELEASED

    def key_state(self, key: str) -> ButtonState:
        return self._keys.get(key, ButtonState.NONE)

    def pressed_keys(self) -> Iterable[str]:
        return [k for k, s in self._keys.items() if s == ButtonState.PRESSED]
