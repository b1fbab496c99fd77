"""Recurrent MARL runner: MAPPO / IPPO / HAPPO with GRU policies.

The reference's recurrent path (`use_recurrent_policy`, actor_critic.py:35-36,
RNNLayer utils/rnn.py) stores per-step rnn states in the buffer and trains
with chunked-BPTT minibatch generators (separated_buffer.py:312-425,
`data_chunk_length`).  With episode_length=8 the natural chunk is the whole
rollout, so this runner implements naive-recurrent training: the update
re-runs the GRU through the full T-chunk from the chunk-start hidden state
(separated_buffer.naive_recurrent_generator semantics).

Hidden states are zeroed at episode boundaries via masks = 1 - done
(runner.py:229-255 mask construction).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from massive_marl_tpu.envs.base import batched_step
from massive_marl_tpu.algos.marl import nets
from massive_marl_tpu.algos.marl.runner import MarlConfig, MarlRunner


@struct.dataclass
class RecurrentMarlTrainState:
    actor_params: Any
    critic_params: Any
    actor_opt: Any
    critic_opt: Any
    vnorm: Any
    actor_h: jnp.ndarray    # [E,N,H]
    critic_h: jnp.ndarray   # [E,N,H]
    env_state: Any
    key: jnp.ndarray
    iteration: jnp.ndarray
    # per-env episode-return accumulator (reference runner.py:145-163)
    ep_ret: Any = None
    last_ep_ret: Any = None
    ep_count: Any = None


class RecurrentMarlRunner(MarlRunner):
    def __init__(self, env, num_envs: int, cfg: MarlConfig | None = None,
                 seed: int = 0, log_dir: str | None = None, print_log: bool = True):
        cfg = cfg or MarlConfig()
        self.H = cfg.hidden_size
        # build the recurrent nets FIRST, then reuse the parent's plumbing
        self._rnn_ready = False
        super().__init__(env, num_envs, cfg, seed, log_dir, print_log)
        c = self.cfg
        self.actor = nets.MarlActorRNN(act_dim=self.act_dim, hidden_size=c.hidden_size,
                                       layer_n=c.layer_n, gain=c.gain,
                                       std_x_coef=c.std_x_coef, std_y_coef=c.std_y_coef)
        self.critic = nets.MarlCriticRNN(hidden_size=c.hidden_size, layer_n=c.layer_n)
        self._rnn_ready = True
        self._train_iter = jax.jit(self._make_train_iter_rnn())

    # ------------------------------------------------------------------ setup
    def init_state(self) -> RecurrentMarlTrainState:
        key = jax.random.PRNGKey(self.seed)
        key, ka, kc, ke = jax.random.split(key, 4)
        E, N, H = self.num_envs, self.N, self.H
        h0 = jnp.zeros((1, H))
        m0 = jnp.ones((1,))
        actor_params = jax.vmap(
            lambda k: self.actor.init(k, jnp.zeros((1, self.obs_dim)), h0, m0)
        )(jax.random.split(ka, N))
        critic_params = jax.vmap(
            lambda k: self.critic.init(k, jnp.zeros((1, self.critic_in_dim)), h0, m0)
        )(jax.random.split(kc, N))
        env_state = jax.jit(jax.vmap(self.env.reset))(jax.random.split(ke, E))
        return RecurrentMarlTrainState(
            actor_params=actor_params, critic_params=critic_params,
            actor_opt=jax.vmap(self.actor_tx.init)(actor_params),
            critic_opt=jax.vmap(self.critic_tx.init)(critic_params),
            vnorm=jax.vmap(lambda _: nets.ValueNorm.create())(jnp.arange(N)),
            actor_h=jnp.zeros((E, N, H)), critic_h=jnp.zeros((E, N, H)),
            env_state=env_state, key=key, iteration=jnp.asarray(0, jnp.int32),
            ep_ret=jnp.zeros(E), last_ep_ret=jnp.zeros(E),
            ep_count=jnp.zeros(E, jnp.int32))

    # --------------------------------------------------------------- train it
    def _make_train_iter_rnn(self):
        cfg = self.cfg
        env = self.env
        N, E, T, H = self.N, self.num_envs, cfg.episode_length, self.H
        actor, critic = self.actor, self.critic
        actor_tx, critic_tx = self.actor_tx, self.critic_tx
        is_happo = cfg.algorithm_name in ("happo", "hatrpo")

        def act_all(ap, obs, h, mask):
            return jax.vmap(lambda p, o, hh, m: actor.apply(p, o, hh, m),
                            in_axes=(0, 1, 1, None), out_axes=1)(ap, obs, h, mask)

        def value_all(cp, cin, h, mask):
            return jax.vmap(lambda p, o, hh, m: critic.apply(p, o, hh, m),
                            in_axes=(0, 1, 1, None), out_axes=1)(cp, cin, h, mask)

        def rollout_step(carry, _):
            env_state, key, ap, cp, ah, ch = carry
            key, k = jax.random.split(key)
            mask = 1.0 - env_state.done.astype(jnp.float32)          # [E]
            obs_buf = jnp.clip(env_state.obs, -cfg.clip_obs, cfg.clip_obs)
            obs, cin = self._agent_views(obs_buf)
            mean, std, ah2 = act_all(ap, obs, ah, mask)
            actions = mean + std * jax.random.normal(k, mean.shape)
            logp = nets.normal_log_prob(mean, std, actions)
            values, ch2 = value_all(cp, cin, ch, mask)
            ns = batched_step(env)(env_state,
                                    jnp.clip(actions, -cfg.clip_actions,
                                             cfg.clip_actions).reshape(E, -1))
            data = dict(obs=obs, share=obs_buf, actions=actions, logp=logp,
                        values=values, mask=mask, reward=ns.reward,
                        done=ns.done.astype(jnp.float32))
            return (ns, key, ap, cp, ah2, ch2), data

        def gae_one_agent(values, rewards, dones, last_value, vn):
            v_den = vn.denormalize(values)
            last_den = vn.denormalize(last_value)

            def back(adv, x):
                r, d, v, nv = x
                delta = r + cfg.gamma * nv * (1 - d) - v
                adv = delta + cfg.gamma * cfg.gae_lambda * (1 - d) * adv
                return adv, adv

            nvs = jnp.concatenate([v_den[1:], last_den[None]], axis=0)
            _, adv = jax.lax.scan(back, jnp.zeros(E), (rewards, dones, v_den, nvs),
                                  reverse=True)
            returns = adv + v_den
            return (adv - adv.mean()) / (adv.std() + 1e-5), returns

        def actor_seq_logp(params, obs_seq, act_seq, mask_seq, h0):
            """Recompute logp through the GRU chain: obs_seq [T,E,obs]."""
            def step(h, x):
                o, a, m = x
                mean, std, h = actor.apply(params, o, h, m)
                return h, (nets.normal_log_prob(mean, std, a),
                           nets.normal_entropy(std))
            _, (logp, ent) = jax.lax.scan(step, h0, (obs_seq, act_seq, mask_seq))
            return logp, ent  # [T,E]

        def critic_seq(params, cin_seq, mask_seq, h0):
            def step(h, x):
                o, m = x
                v, h = critic.apply(params, o, h, m)
                return h, v
            _, v = jax.lax.scan(step, h0, (cin_seq, mask_seq))
            return v

        def agent_update(ap, ao, cp, co, vn, data, factor):
            """cfg.ppo_epoch naive-recurrent BPTT updates for one agent.
            data: obs [T,E,obs], actions, logp, values [T,E], adv, returns,
            mask [T,E broadcast from T], cin [T,E,cin], ah0/ch0 [E,H]."""

            def actor_loss(p):
                logp, ent = actor_seq_logp(p, data["obs"], data["actions"],
                                           data["mask"], data["ah0"])
                ratio = jnp.exp(logp - data["logp"])
                surr1 = ratio * data["adv"]
                surr2 = jnp.clip(ratio, 1 - cfg.clip_param, 1 + cfg.clip_param) * data["adv"]
                loss = -jnp.mean(factor.reshape(T, E) * jnp.minimum(surr1, surr2))
                return loss - cfg.entropy_coef * ent.mean(), loss

            def critic_loss(p, vn):
                v = critic_seq(p, data["cin"], data["mask"], data["ch0"])
                ret_n = vn.normalize(data["returns"])
                v_clip = data["values"] + jnp.clip(v - data["values"],
                                                   -cfg.clip_param, cfg.clip_param)
                l = jnp.maximum(nets.huber(ret_n - v, cfg.huber_delta),
                                nets.huber(ret_n - v_clip, cfg.huber_delta))
                return cfg.value_loss_coef * l.mean(), l.mean()

            def one_epoch(carry, _):
                ap, ao, cp, co, vn = carry
                (al, aloss), ag = jax.value_and_grad(actor_loss, has_aux=True)(ap)
                au, ao = actor_tx.update(ag, ao, ap)
                ap = optax.apply_updates(ap, au)
                vn = vn.update(data["returns"])
                (cl, vloss), cg = jax.value_and_grad(critic_loss, has_aux=True)(cp, vn)
                cu, co = critic_tx.update(cg, co, cp)
                cp = optax.apply_updates(cp, cu)
                return (ap, ao, cp, co, vn), (aloss, vloss)

            (ap, ao, cp, co, vn), (alosses, vlosses) = jax.lax.scan(
                one_epoch, (ap, ao, cp, co, vn), None, length=cfg.ppo_epoch)
            return ap, ao, cp, co, vn, alosses.mean(), vlosses.mean()

        def train_iter(ts: RecurrentMarlTrainState):
            ah0_all, ch0_all = ts.actor_h, ts.critic_h        # [E,N,H]
            (env_state, key, _, _, ah, ch), traj = jax.lax.scan(
                rollout_step,
                (ts.env_state, ts.key, ts.actor_params, ts.critic_params,
                 ts.actor_h, ts.critic_h), None, length=T)
            last_buf = jnp.clip(env_state.obs, -cfg.clip_obs, cfg.clip_obs)
            _, last_cin = self._agent_views(last_buf)
            last_mask = 1.0 - env_state.done.astype(jnp.float32)
            last_values, _ = value_all(ts.critic_params, last_cin, ch, last_mask)

            adv, returns = jax.vmap(gae_one_agent, in_axes=(2, None, None, 1, 0),
                                    out_axes=2)(
                traj["values"], traj["reward"], traj["done"], last_values, ts.vnorm)

            share_seq = traj["share"]                        # [T,E,share]

            def agent_data(i):
                g = lambda x: jax.lax.dynamic_index_in_dim(x, i, axis=2, keepdims=False)
                obs_i = g(traj["obs"])
                cin_i = share_seq if cfg.use_centralized_v else obs_i
                return dict(obs=obs_i, cin=cin_i, actions=g(traj["actions"]),
                            logp=g(traj["logp"]), values=g(traj["values"]),
                            adv=g(adv), returns=g(returns), mask=traj["mask"],
                            ah0=jax.lax.dynamic_index_in_dim(ah0_all, i, 1, False),
                            ch0=jax.lax.dynamic_index_in_dim(ch0_all, i, 1, False))

            if not is_happo:
                def upd(ap, ao, cp, co, vn, i):
                    return agent_update(ap, ao, cp, co, vn, agent_data(i),
                                        jnp.ones(T * E))
                ap, ao, cp, co, vn, alosses, vlosses = jax.vmap(upd)(
                    ts.actor_params, ts.actor_opt, ts.critic_params,
                    ts.critic_opt, ts.vnorm, jnp.arange(N))
            else:
                key, kp = jax.random.split(key)
                perm = jax.random.permutation(kp, N)

                def happo_agent(carry, i):
                    ap_all, ao_all, cp_all, co_all, vn_all, factor = carry
                    gi = lambda t: jax.tree_util.tree_map(
                        lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, False), t)
                    si = lambda t, nw: jax.tree_util.tree_map(
                        lambda x, nx: jax.lax.dynamic_update_index_in_dim(x, nx, i, 0),
                        t, nw)
                    ap, ao, cp, co, vn = (gi(ap_all), gi(ao_all), gi(cp_all),
                                          gi(co_all), gi(vn_all))
                    data = agent_data(i)
                    old_logp, _ = actor_seq_logp(ap, data["obs"], data["actions"],
                                                 data["mask"], data["ah0"])
                    ap, ao, cp, co, vn, al, vl = agent_update(ap, ao, cp, co, vn,
                                                              data, factor)
                    new_logp, _ = actor_seq_logp(ap, data["obs"], data["actions"],
                                                 data["mask"], data["ah0"])
                    factor = factor * jnp.exp(new_logp - old_logp).reshape(-1)
                    return (si(ap_all, ap), si(ao_all, ao), si(cp_all, cp),
                            si(co_all, co), si(vn_all, vn), factor), (al, vl)

                init = (ts.actor_params, ts.actor_opt, ts.critic_params,
                        ts.critic_opt, ts.vnorm, jnp.ones(T * E))
                (ap, ao, cp, co, vn, _), (alosses, vlosses) = jax.lax.scan(
                    happo_agent, init, perm)

            def ep_step(c, x):
                ep, last, cnt = c
                r, d = x
                ep = ep + r
                fin = d > 0
                last = jnp.where(fin, ep, last)
                cnt = cnt + fin.astype(jnp.int32)
                return (jnp.where(fin, 0.0, ep), last, cnt), None

            (ep_ret, last_ep, ep_cnt), _ = jax.lax.scan(
                ep_step, (ts.ep_ret, ts.last_ep_ret, ts.ep_count),
                (traj["reward"], traj["done"]))
            have = ep_cnt > 0
            metrics = dict(mean_reward=traj["reward"].mean(),
                           value_loss=vlosses.mean(), policy_loss=alosses.mean(),
                           done_frac=traj["done"].mean(),
                           episode_rewards=jnp.sum(jnp.where(have, last_ep, 0.0))
                           / jnp.maximum(1, have.sum()),
                           episodes_done=have.sum())
            return RecurrentMarlTrainState(
                actor_params=ap, critic_params=cp, actor_opt=ao, critic_opt=co,
                vnorm=vn, actor_h=ah, critic_h=ch, env_state=env_state, key=key,
                iteration=ts.iteration + 1,
                ep_ret=ep_ret, last_ep_ret=last_ep, ep_count=ep_cnt), metrics

        return train_iter

    def eval(self, n_steps: int = 1000, deterministic: bool = True):
        if self.state is None:
            self.state = self.init_state()
        cfg = self.cfg

        def step(carry, _):
            st, ah = carry
            mask = 1.0 - st.done.astype(jnp.float32)
            obs, _ = self._agent_views(jnp.clip(st.obs, -cfg.clip_obs, cfg.clip_obs))
            mean, _, ah = jax.vmap(lambda p, o, h, m: self.actor.apply(p, o, h, m),
                                   in_axes=(0, 1, 1, None), out_axes=1)(
                self.state.actor_params, obs, ah, mask)
            st = batched_step(self.env)(st, jnp.clip(mean, -1, 1).reshape(self.num_envs, -1))
            return (st, ah), st.reward

        (_, _), rewards = jax.jit(lambda s, h: jax.lax.scan(step, (s, h), None,
                                                            length=n_steps))(
            self.state.env_state, self.state.actor_h)
        return float(rewards.mean())
